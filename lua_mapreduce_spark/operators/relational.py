"""Relational core: scan/project/filter, joins, aggregates, sorts, set ops,
scalar functions (SURVEY.md §2.4 gap-fill).

The reference has none of these — its only dataflow is map/shuffle/reduce
(lua-mapreduce-server.lua:269-327) and README TODO #5 even lists "filter
after reduce" as unimplemented (README.md:52). Everything here is expressed
declaratively on DataFrames so Catalyst supplies pushdown, pruning, join
planning and whole-stage codegen.

Scale notes per operator are inline. General rules applied:
 * constant-size dimension joins (region/nation) are broadcast — no
   shuffle of the fact table; linearly-growing relations never carry a
   broadcast hint (AQE picks their strategy from runtime size);
 * top-k is orderBy+limit (Spark plans TakeOrderedAndProject: per-partition
   heap + driver merge of k rows, never a global sort);
 * aggregations use decimal-exact sums (functions/exact.py) — deterministic
   at any partition count;
 * every filter is a simple column predicate so it reaches the parquet scan
   as a PushedFilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import (
    CHARGE,
    REVENUE,
    davg_expr,
    davg_sql,
    dec,
    dsum_expr,
    dsum_sql,
)

# --------------------------------------------------------------------------
# Q1-style pricing summary: scan + pushed filter + group-agg.
# Map-side partial aggregation (the reference ships raw (word,1) pairs per
# token — lua-mapreduce-client.lua:168-175; Spark partial-aggs for free).
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_expr(dec("l_quantity"), "sum_qty"),
            dsum_expr(dec("l_extendedprice"), "sum_base_price"),
            dsum_expr(REVENUE, "sum_disc_price"),
            dsum_expr(CHARGE, "sum_charge"),
            davg_expr(dec("l_quantity"), "avg_qty"),
            davg_expr(dec("l_extendedprice"), "avg_price"),
            davg_expr(dec("l_discount", "DECIMAL(3,2)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql(dec("l_quantity"), "sum_qty")},
       {dsum_sql(dec("l_extendedprice"), "sum_base_price")},
       {dsum_sql(REVENUE, "sum_disc_price")},
       {dsum_sql(CHARGE, "sum_charge")},
       {davg_sql(dec("l_quantity"), "avg_qty")},
       {davg_sql(dec("l_extendedprice"), "avg_price")},
       {davg_sql(dec("l_discount", "DECIMAL(3,2)"), "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join + agg + deterministic top-k.
# customer grows linearly with SF, so no forced broadcast — AQE broadcasts
# it at runtime only while it fits the budget; the orders⋈lineitem join
# shuffles on orderkey (both sides huge at 100 TB, AQE handles skew).
# Top-k via TakeOrderedAndProject, ties broken on orderkey.
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {dsum_sql(REVENUE, "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5-style local-supplier volume: 6-way join through the dimension chain.
# Only region/nation carry broadcast hints (constant 5/25 rows at any SF);
# customer/supplier grow linearly, so their join strategy is left to
# AQE/CBO — forcing a broadcast there OOMs a 100 TB run.
# --------------------------------------------------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, supplier, customer, orders, lineitem = (
        load_table(spark, sf_dir, t)
        for t in ("region", "nation", "supplier", "customer", "orders", "lineitem")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_ORACLE = f"""
SELECT n_name, {dsum_sql(REVENUE, "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# Join kinds. Inner/left/semi/anti on orders⋈customer. The semi/anti forms
# matter at scale: they never materialize the probe side's payload columns.
# --------------------------------------------------------------------------


def join_inner_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_totalprice") > 400000.0)
        .select(
            "o_orderkey",
            "c_name",
            "c_mktsegment",
            F.col("o_totalprice").alias("totalprice"),
        )
    )


JOIN_INNER_ORACLE = """
SELECT o_orderkey, c_name, c_mktsegment, o_totalprice AS totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000.0
"""


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (count = 0)."""
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against the URGENT order subset: at the test SFs every
    customer has SOME order, so anti-joining all of orders returned 0 rows
    and verified nothing — restricting the right side keeps the check
    non-vacuous while exercising the same left_anti plan."""
    customer, orders = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# Aggregate variants.
# --------------------------------------------------------------------------


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase distinct-then-count
    under AQE; no driver involvement."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total, the
    reference's 'filter after reduce' TODO generalized (README.md:52)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum_expr(dec("l_extendedprice"), "revenue"), F.count(F.lit(1)).alias("n"))
    )


AGG_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql(dec("l_extendedprice"), "revenue")}, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def agg_cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum_expr(dec("l_quantity"), "sum_qty"), F.count(F.lit(1)).alias("n")
    )


AGG_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql(dec("l_quantity"), "sum_qty")}, COUNT(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter — the reference's README TODO #5."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"), dsum_expr(dec("o_totalprice"), "total_spend"))
        .filter(F.col("order_count") >= 20)
    )


AGG_HAVING_ORACLE = f"""
SELECT o_custkey, COUNT(*) AS order_count, {dsum_sql(dec("o_totalprice"), "total_spend")}
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
"""


def agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_date"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_date"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_MINMAX_ORACLE = """
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_date,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_date,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Sort / limit / top-k.
# --------------------------------------------------------------------------


def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap of
    k, driver merges k*partitions rows. Never a full sort at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"))
        .limit(25)
    )


SORT_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------


def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that placed an URGENT order but never a LOW one, plus the
    symmetric group, labeled — exercises intersect/except through one query."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    only_urgent = urgent.exceptAll(low).withColumn("bucket", F.lit("urgent_only"))
    only_low = low.exceptAll(urgent).withColumn("bucket", F.lit("low_only"))
    both = urgent.intersect(low).withColumn("bucket", F.lit("both"))
    return only_urgent.unionAll(only_low).unionAll(both)


SETOP_ORACLE = """
WITH urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     low    AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
SELECT o_custkey, 'urgent_only' AS bucket FROM (SELECT o_custkey FROM urgent EXCEPT ALL SELECT o_custkey FROM low)
UNION ALL
SELECT o_custkey, 'low_only' AS bucket FROM (SELECT o_custkey FROM low EXCEPT ALL SELECT o_custkey FROM urgent)
UNION ALL
SELECT o_custkey, 'both' AS bucket FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM low)
"""


# --------------------------------------------------------------------------
# Scalar functions: string/date/math/conditional in one projection query.
# All stay inside whole-stage codegen — zero Python in the row path.
# --------------------------------------------------------------------------


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("priority_num"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_priority"),
        F.length(F.col("o_orderpriority")).alias("priority_len"),
        F.year(F.col("o_orderdate")).alias("order_year"),
        F.month(F.col("o_orderdate")).alias("order_month"),
        F.dayofmonth(F.col("o_orderdate")).alias("order_day"),
        F.quarter(F.col("o_orderdate")).alias("order_quarter"),
        F.round(F.col("o_totalprice"), 0).alias("price_round"),
        F.floor(F.col("o_totalprice")).alias("price_floor"),
        F.ceil(F.col("o_totalprice")).alias("price_ceil"),
        F.sqrt(F.col("o_totalprice")).alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 250000.0, "big").otherwise("small").alias("size_bucket"),
    )


SCALAR_ORACLE = """
SELECT o_orderkey,
       UPPER(o_orderstatus) AS status_upper,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_num,
       o_orderstatus || '-' || o_orderpriority AS status_priority,
       LENGTH(o_orderpriority) AS priority_len,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
       ROUND(o_totalprice, 0) AS price_round,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
       SQRT(o_totalprice) AS price_sqrt,
       o_orderkey % 7 AS key_mod7,
       CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS size_bucket
FROM orders WHERE o_orderkey % 100 = 0
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "join_inner_basic": join_inner_basic,
    "join_left_order_counts": join_left_order_counts,
    "join_semi_customers_with_urgent": join_semi_customers_with_urgent,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "agg_distinct_counts": agg_distinct_counts,
    "agg_rollup_revenue": agg_rollup_revenue,
    "agg_cube_quantity": agg_cube_quantity,
    "agg_having": agg_having,
    "agg_minmax_stats": agg_minmax_stats,
    "sort_topk_orders": sort_topk_orders,
    "setop_union_intersect_except": setop_union_intersect_except,
    "scalar_functions_showcase": scalar_functions_showcase,
}

ORACLES = {
    "q1_pricing_summary": Q1_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q5_local_supplier_volume": Q5_ORACLE,
    "join_inner_basic": JOIN_INNER_ORACLE,
    "join_left_order_counts": JOIN_LEFT_ORACLE,
    "join_semi_customers_with_urgent": JOIN_SEMI_ORACLE,
    "join_anti_customers_without_orders": JOIN_ANTI_ORACLE,
    "agg_distinct_counts": AGG_DISTINCT_ORACLE,
    "agg_rollup_revenue": AGG_ROLLUP_ORACLE,
    "agg_cube_quantity": AGG_CUBE_ORACLE,
    "agg_having": AGG_HAVING_ORACLE,
    "agg_minmax_stats": AGG_MINMAX_ORACLE,
    "sort_topk_orders": SORT_TOPK_ORACLE,
    "setop_union_intersect_except": SETOP_ORACLE,
    "scalar_functions_showcase": SCALAR_ORACLE,
}

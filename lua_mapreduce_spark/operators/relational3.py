"""Third-wave relational operators: outer/cross joins, grouping sets,
pivot/unpivot, distribution window functions, range frames, and the
remaining TPC-H-style query shapes the test tables can express
(SURVEY.md §2.4 rows: joins-all-kinds, aggregations, window functions).

Scale notes per operator. Recurring themes:
- every pivot passes its value list explicitly (otherwise Spark runs an
  extra distinct-scan job over the full table just to learn the columns);
- outer joins key on the same column names so Spark can plan a sort-merge
  join without a projection barrier;
- cross joins appear only with broadcast-tiny sides (a shuffled cartesian
  product at 100 TB is a non-starter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import REVENUE, dec, dsum_expr, dsum_sql

# --------------------------------------------------------------------------
# Right outer join: every high-balance customer kept, order columns null
# where unmatched. NB: an outer join can only hash-build its NON-preserved
# side, so the small preserved dim cannot be broadcast — no hint here; at
# scale this correctly plans as a sort-merge join on o_custkey.
# --------------------------------------------------------------------------


def join_right_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900.0)
    return orders.join(
        rich, F.col("o_custkey") == F.col("c_custkey"), "right"
    ).select("c_custkey", F.col("c_acctbal").alias("acctbal"), "o_orderkey")


RIGHT_OUTER_ORACLE = """
SELECT c_custkey, c_acctbal AS acctbal, o_orderkey
FROM orders RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal > 9900.0) c
  ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Full outer join: nations that have high-balance customers vs. nations
# that have high-balance suppliers — both aggregated first (tiny sides),
# so the full outer join runs over two already-reduced inputs. At scale:
# aggregate-then-join is the only sane order; joining raw fact tables full
# outer is O(n) shuffle on both sides.
# --------------------------------------------------------------------------


def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9800.0)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_big_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9800.0)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_big_supp"))
    )
    return cust.join(supp, F.col("ck") == F.col("sk"), "full").select(
        F.coalesce("ck", "sk").alias("nationkey"), "n_big_cust", "n_big_supp"
    )


FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS ck, COUNT(*) AS n_big_cust
  FROM customer WHERE c_acctbal > 9800.0 GROUP BY c_nationkey),
s AS (
  SELECT s_nationkey AS sk, COUNT(*) AS n_big_supp
  FROM supplier WHERE s_acctbal > 9800.0 GROUP BY s_nationkey)
SELECT COALESCE(ck, sk) AS nationkey, n_big_cust, n_big_supp
FROM c FULL OUTER JOIN s ON ck = sk
"""


# --------------------------------------------------------------------------
# Cross join: region x distinct order-status — both sides tiny, planned as
# BroadcastNestedLoopJoin. The guard rail for 100 TB is structural: cross
# joins in this engine only ever pair broadcast-small relations.
# --------------------------------------------------------------------------


def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(F.broadcast(status)).select(
        "r_regionkey", "r_name", "o_orderstatus"
    )


CROSS_JOIN_ORACLE = """
SELECT r_regionkey, r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
"""


# --------------------------------------------------------------------------
# GROUPING SETS: detail + per-flag subtotal + grand total in ONE pass.
# Spark expands grouping sets inside a single hash-aggregate (Expand node)
# — one shuffle, not three scans + union. Null grouping keys are coalesced
# to 'ALL' so the marker is engine-portable.
# --------------------------------------------------------------------------


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               {dsum_sql(dec("l_quantity"), "sum_qty")}
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


GROUPING_SETS_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       {dsum_sql(dec("l_quantity"), "sum_qty")}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --------------------------------------------------------------------------
# PIVOT: wide-format aggregation. Pivot values are passed EXPLICITLY —
# without them Spark runs a separate distinct job over the whole table
# before it can even plan, an extra full scan at 100 TB.
# --------------------------------------------------------------------------


def pivot_qty_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.expr(f"CAST(SUM({dec('l_quantity')}) AS DOUBLE)"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )


PIVOT_ORACLE = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {dec("l_quantity")} END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {dec("l_quantity")} END) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# UNPIVOT (melt): wide -> long via stack(), a zero-shuffle projection —
# each input row expands to k output rows inside the same task.
# --------------------------------------------------------------------------


def unpivot_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 997 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'discount', l_discount, 'tax', l_tax) AS (rate_kind, rate)"
        ),
    )


UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'discount' AS rate_kind, l_discount AS rate
FROM lineitem WHERE l_orderkey % 997 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax' AS rate_kind, l_tax AS rate
FROM lineitem WHERE l_orderkey % 997 = 0
"""


# --------------------------------------------------------------------------
# Distribution window functions: ntile / percent_rank / cume_dist /
# nth_value. Ordering includes o_orderkey as a tiebreak so peer groups are
# single rows — deterministic across engines AND across Spark partition
# counts (rank functions over non-unique orderings are not).
# --------------------------------------------------------------------------


def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
    )


WINDOW_DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       nth_value(o_orderkey, 2) OVER w AS second_cheapest
FROM orders WHERE o_orderkey % 13 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# --------------------------------------------------------------------------
# RANGE frame: value-based window — for each order, how many orders of the
# same priority fall within $5000 below its price. RANGE frames are
# tie-stable by construction (frame membership depends on values, not row
# positions). The sum stays in the decimal domain for cross-engine
# bit-equality.
# --------------------------------------------------------------------------


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB: pyspark's Window.rangeBetween only accepts integral offsets; a
    # 5000.0 double bound over a double ordering column needs the SQL form.
    frame = (
        "PARTITION BY o_orderpriority ORDER BY o_totalprice "
        "RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").alias("totalprice"),
        F.expr(f"COUNT(*) OVER ({frame})").alias("n_within_5k_below"),
        F.expr(
            f"CAST(SUM({dec('o_totalprice')}) OVER ({frame}) AS DOUBLE)"
        ).alias("sum_within_5k_below"),
    )


WINDOW_RANGE_ORACLE = f"""
SELECT o_orderkey, o_orderpriority, o_totalprice AS totalprice,
       COUNT(*) OVER w AS n_within_5k_below,
       CAST(SUM({dec("o_totalprice")}) OVER w AS DOUBLE) AS sum_within_5k_below
FROM orders WHERE o_orderkey % 7 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a per-row
# join condition (late shipment). The semi join shuffles both sides on
# orderkey once; the count-by-priority after it is a tiny agg.
# --------------------------------------------------------------------------


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
# Join order matters at scale: lineitem('R') |><| orders(date window) on
# orderkey first (both shuffled once), the aggregated per-customer result
# is then small enough that the customer join shuffles only ~|customers|
# rows. ORDER BY includes c_custkey so the LIMIT frontier is deterministic.
# --------------------------------------------------------------------------


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum_expr(REVENUE, "revenue"))
    )
    return (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "c_nationkey", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey, {dsum_sql(REVENUE, "revenue")}
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1997-07-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, c_nationkey, revenue
FROM customer JOIN per_cust ON c_custkey = o_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share for one ship-month. part is the
# smaller side but grows linearly with SF, so AQE chooses the join
# strategy (broadcast while it fits, shuffle beyond). The share is
# one IEEE division of two exact decimal sums — deterministic.
# --------------------------------------------------------------------------


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                f"CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE CAST(0 AS DECIMAL(22,6)) END) "
                f"AS DOUBLE) / CAST(SUM({REVENUE}) AS DOUBLE)"
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q14_ORACLE = f"""
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
         / CAST(SUM({REVENUE}) AS DOUBLE) AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


# --------------------------------------------------------------------------
# Conditional scalar functions: CASE / coalesce / nullif / least /
# greatest / if — all JVM-side, all inside whole-stage codegen.
# --------------------------------------------------------------------------


def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000.0, "big")
        .when(F.col("o_totalprice") > 50000.0, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
        F.greatest(F.col("o_custkey") % 10, F.lit(5).cast("long")).alias("floor5"),
        F.expr("IF(o_orderpriority = '1-URGENT', 1, 0)").alias("is_urgent"),
    )


SCALAR_CONDITIONAL_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000.0 THEN 'big'
            WHEN o_totalprice > 50000.0 THEN 'mid'
            ELSE 'small' END AS size_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       LEAST(o_totalprice, 100000.0) AS capped_price,
       GREATEST(o_custkey % 10, 5) AS floor5,
       CAST(IF(o_orderpriority = '1-URGENT', 1, 0) AS INT) AS is_urgent
FROM orders WHERE o_orderkey % 101 = 0
"""


QUERIES = {
    "join_right_outer_orders": join_right_outer_orders,
    "join_full_outer_nation_presence": join_full_outer_nation_presence,
    "join_cross_region_status": join_cross_region_status,
    "agg_grouping_sets": agg_grouping_sets,
    "pivot_qty_by_linestatus": pivot_qty_by_linestatus,
    "unpivot_rates": unpivot_rates,
    "window_distribution_funcs": window_distribution_funcs,
    "window_range_frame": window_range_frame,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_share": q14_promo_share,
    "scalar_conditional_funcs": scalar_conditional_funcs,
}

ORACLES = {
    "join_right_outer_orders": RIGHT_OUTER_ORACLE,
    "join_full_outer_nation_presence": FULL_OUTER_ORACLE,
    "join_cross_region_status": CROSS_JOIN_ORACLE,
    "agg_grouping_sets": GROUPING_SETS_ORACLE,
    "pivot_qty_by_linestatus": PIVOT_ORACLE,
    "unpivot_rates": UNPIVOT_ORACLE,
    "window_distribution_funcs": WINDOW_DISTRIBUTION_ORACLE,
    "window_range_frame": WINDOW_RANGE_ORACLE,
    "q4_priority_late_ship": Q4_ORACLE,
    "q10_returned_revenue": Q10_ORACLE,
    "q14_promo_share": Q14_ORACLE,
    "scalar_conditional_funcs": SCALAR_CONDITIONAL_ORACLE,
}

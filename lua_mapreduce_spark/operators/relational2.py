"""Advanced relational operators: subqueries, range & as-of joins, argmax
aggregates, exact percentiles, statistical moments, date/array scalars
(SURVEY.md §2.4 gap-fill, second wave).

Scale notes inline per operator. The as-of join is the flagship here: the
naive formulation (inequality join + row_number) is O(n·m) per key; the
implementation below uses the union-tag + window trick — one sort-shuffle,
linear state, the same algorithm kdb/QuestDB/Flink use for as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import dec, dsum_expr, dsum_sql

# --------------------------------------------------------------------------
# Q6-style: single-table filter + agg — the pushdown showcase. Every
# predicate reaches the parquet scan as a PushedFilter.
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum_expr(f"{dec('l_extendedprice')} * {dec('l_discount', 'DECIMAL(3,2)')}", "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_ORACLE = f"""
SELECT {dsum_sql(f"{dec('l_extendedprice')} * {dec('l_discount', 'DECIMAL(3,2)')}", "revenue")},
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24.0
"""


# --------------------------------------------------------------------------
# Q18-style: semi-join against an aggregated subquery (large-quantity
# orders). The subquery aggregates THEN joins; its cardinality is
# data-dependent (O(|orders|) worst case), so no forced broadcast — AQE
# broadcasts at runtime iff the aggregate output is actually small.
# --------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(f"CAST(SUM({dec('l_quantity')}) AS DOUBLE)").alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM({dec("l_quantity")}) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM({dec("l_quantity")}) AS DOUBLE) > 150.0)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice,
       total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
"""


# --------------------------------------------------------------------------
# Correlated-subquery pattern: customers above their nation's average
# balance. Decorrelated by hand into agg + broadcast join — what Catalyst's
# RewriteCorrelatedScalarSubquery does, stated explicitly.
# --------------------------------------------------------------------------


def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        F.expr(
            f"CAST(SUM({dec('c_acctbal')}) AS DOUBLE) / CAST(COUNT(c_acctbal) AS DOUBLE)"
        ).alias("nation_avg")
    )
    return (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_nationkey", F.col("c_acctbal").alias("acctbal"), "nation_avg")
    )


SUBQUERY_AVG_ORACLE = f"""
WITH na AS (
  SELECT c_nationkey,
         CAST(SUM({dec("c_acctbal")}) AS DOUBLE) / CAST(COUNT(c_acctbal) AS DOUBLE) AS nation_avg
  FROM customer GROUP BY c_nationkey)
SELECT c_custkey, c_name, c.c_nationkey, c_acctbal AS acctbal, nation_avg
FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
WHERE c_acctbal > nation_avg
"""


# --------------------------------------------------------------------------
# Range join: lineitem rows bucketed into month ranges derived from the
# data itself. Because every range boundary is an exact month bucket, the
# value-vs-interval predicate rewrites as a hash EQUI-join on
# date_trunc('month', value) == month_start — no BroadcastNestedLoopJoin,
# no per-row interval comparisons that grow with the data's time span.
# (The oracle keeps the original inequality form, proving the rewrite.)
# For ranges that are NOT aligned buckets, see range_join_binned
# (scale_ops2.py) for the general bin-explosion equi-join.
# --------------------------------------------------------------------------


def range_join_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    months = (
        li.select(F.date_trunc("month", "l_shipdate").alias("month_start"))
        .distinct()
        .select(
            "month_start",
            F.add_months(F.col("month_start"), 1).alias("month_end"),
        )
    )
    return (
        li.withColumn("l_month", F.date_trunc("month", "l_shipdate"))
        .join(
            F.broadcast(months),
            F.col("l_month") == F.col("month_start"),
        )
        .groupBy(F.date_format("month_start", "yyyy-MM").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_expr(dec("l_extendedprice"), "month_revenue"),
        )
    )


RANGE_JOIN_ORACLE = f"""
WITH months AS (
  SELECT DISTINCT date_trunc('month', l_shipdate) AS month_start,
         date_trunc('month', l_shipdate) + INTERVAL 1 MONTH AS month_end
  FROM lineitem)
SELECT strftime(month_start, '%Y-%m') AS ship_month,
       COUNT(*) AS n_items,
       {dsum_sql(dec("l_extendedprice"), "month_revenue")}
FROM lineitem JOIN months
  ON l_shipdate >= month_start AND l_shipdate < month_end
GROUP BY 1
"""


# --------------------------------------------------------------------------
# As-of join (attribution): for each purchase event, the most recent
# preceding view/click by the same user. Implemented with the union-tag +
# window-carry-forward trick: ONE sort-shuffle on user_id, O(1) state per
# row — not an inequality join (which would be O(n·m) per user).
# --------------------------------------------------------------------------


def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_id")
    )
    return (
        ev.withColumn("last_touch_id", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "last_touch_id",
        )
    )


ASOF_ORACLE = """
SELECT user_id,
       event_id AS purchase_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       last_touch_id
FROM (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch_id
  FROM events)
WHERE event_type = 'purchase'
"""


# As-of join with a tolerance (lookback) bound — the standard attribution
# refinement: a purchase is credited to the most recent preceding
# view/click by the same user ONLY if it happened within the window;
# older touches lapse. Same union-tag + window carry-forward shape as
# asof_join_attribution (ONE sort-shuffle on user_id, O(1) state per
# row); the tolerance is a post-carry comparison, not a join condition,
# so the plan never degrades to an inequality join.

_ASOF_TOL_DAYS = 4  # attribution window


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_id = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_id")
    )
    touch_ts = F.when(F.col("event_type").isin("view", "click"), F.col("ts"))
    # Raw-timestamp INTERVAL comparison: microsecond-exact in both engines
    # (epoch-seconds flooring truncates differently across engines near
    # the boundary).
    in_window = F.col("ts") <= F.expr(
        f"lt_ts + INTERVAL {_ASOF_TOL_DAYS} DAYS"
    )
    return (
        ev.withColumn("lt_id", F.last(touch_id, ignorenulls=True).over(w))
        .withColumn("lt_ts", F.last(touch_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.when(in_window, F.col("lt_id")).alias("attributed_touch_id"),
            F.coalesce(in_window, F.lit(False)).alias("is_attributed"),
        )
    )


ASOF_TOLERANCE_ORACLE = f"""
SELECT user_id,
       event_id AS purchase_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN in_window THEN lt_id END AS attributed_touch_id,
       COALESCE(in_window, FALSE) AS is_attributed
FROM (
  SELECT user_id, event_id, ts, event_type, lt_id,
         ts <= lt_ts + INTERVAL {_ASOF_TOL_DAYS} DAY AS in_window
  FROM (
    SELECT user_id, event_id, ts, event_type,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END IGNORE NULLS)
             OVER w AS lt_id,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END IGNORE NULLS)
             OVER w AS lt_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# argmax/argmin aggregates + exact percentiles + exact variance.
# --------------------------------------------------------------------------


def agg_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by — single-pass argmax, no self-join, no window.
    Tie-breaking in max_by/arg_max is unspecified in both engines, so the
    argmax is expressed as MAX over a (price, orderkey) struct + field
    extraction: lexicographic struct comparison makes the winner unique
    even with duplicate prices (DuckDB's arg_max cannot take a composite
    ordering value, but MIN/MAX over a struct works in both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("max(struct(o_totalprice, o_orderkey)).o_orderkey").alias("priciest_order"),
        F.expr("min(struct(o_totalprice, o_orderkey)).o_orderkey").alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


ARGMAX_ORACLE = """
SELECT o_orderpriority,
       (MAX(struct_pack(p := o_totalprice, k := o_orderkey))).k AS priciest_order,
       (MIN(struct_pack(p := o_totalprice, k := o_orderkey))).k AS cheapest_order,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders GROUP BY o_orderpriority
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (Spark `percentile`, not
    percentile_approx — approx sketches aren't cross-engine comparable)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
"""


def agg_exact_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance of l_quantity from exact decimal moments.

    Built-in stddev/var merge (count, mean, M2) partials in task-completion
    order — run-to-run nondeterministic in the last bits. Integer-valued
    quantities make Σx and Σx² exactly representable, so the two-pass
    formula is deterministic and portable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.expr(f"CAST(SUM({dec('l_quantity')}) AS DOUBLE)").alias("sum_q"),
            F.expr(
                "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_q2"),
        )
        .select(
            "l_returnflag",
            "n",
            (
                (F.col("sum_q2") - F.col("sum_q") * F.col("sum_q") / F.col("n").cast("double"))
                / (F.col("n") - 1).cast("double")
            ).alias("var_qty"),
        )
    )


EXACT_VARIANCE_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         CAST(SUM({dec("l_quantity")}) AS DOUBLE) AS sum_q,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q2
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (sum_q2 - sum_q * sum_q / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty
FROM m
"""


# --------------------------------------------------------------------------
# Scalar coverage: date arithmetic and array/map functions.
# --------------------------------------------------------------------------


def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("d_plus30"),
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias("d_plus3m"),
        F.date_format(F.trunc(F.col("o_orderdate"), "month"), "yyyy-MM-dd").alias("month_floor"),
        F.date_format(F.last_day(F.col("o_orderdate")), "yyyy-MM-dd").alias("month_last"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("week_no"),
    )


SCALAR_DATE_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS d,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS d_plus3m,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_floor,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_last,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(weekofyear(o_orderdate) AS INT) AS week_no
FROM orders WHERE o_orderkey % 97 = 0
"""


def scalar_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/manipulation + map access, JVM-side only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.expr("slice(split(text, ' '), 1, 5)").alias("arr"))
        .select(
            "doc_id",
            F.size("arr").alias("arr_len"),
            F.expr("array_contains(arr, 'the')").alias("has_the"),
            F.concat_ws("|", F.reverse("arr")).alias("rev_joined"),
            F.expr("sort_array(arr)").cast("string").alias("sorted_arr"),
            F.expr("map_keys(map('a', 1, 'b', 2))").cast("string").alias("mk"),
            F.expr("element_at(map('a', 1, 'b', 2), 'b')").alias("b_val"),
        )
    )


SCALAR_ARRAY_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ')[1:5] AS arr
  FROM documents WHERE doc_id % 10 = 0)
SELECT doc_id,
       CAST(len(arr) AS INT) AS arr_len,
       list_contains(arr, 'the') AS has_the,
       list_aggregate(list_reverse(arr), 'string_agg', '|') AS rev_joined,
       '[' || list_aggregate(list_sort(arr), 'string_agg', ', ') || ']' AS sorted_arr,
       '[a, b]' AS mk,
       2 AS b_val
FROM base
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q18_large_orders": q18_large_orders,
    "subquery_above_nation_avg": subquery_above_nation_avg,
    "range_join_monthly": range_join_monthly,
    "asof_join_attribution": asof_join_attribution,
    "asof_join_tolerance": asof_join_tolerance,
    "agg_argmax_orders": agg_argmax_orders,
    "agg_percentiles": agg_percentiles,
    "agg_exact_variance": agg_exact_variance,
    "scalar_date_arithmetic": scalar_date_arithmetic,
    "scalar_array_map_funcs": scalar_array_map_funcs,
}

ORACLES = {
    "q6_forecast_revenue": Q6_ORACLE,
    "q18_large_orders": Q18_ORACLE,
    "subquery_above_nation_avg": SUBQUERY_AVG_ORACLE,
    "range_join_monthly": RANGE_JOIN_ORACLE,
    "asof_join_attribution": ASOF_ORACLE,
    "asof_join_tolerance": ASOF_TOLERANCE_ORACLE,
    "agg_argmax_orders": ARGMAX_ORACLE,
    "agg_percentiles": PERCENTILES_ORACLE,
    "agg_exact_variance": EXACT_VARIANCE_ORACLE,
    "scalar_date_arithmetic": SCALAR_DATE_ORACLE,
    "scalar_array_map_funcs": SCALAR_ARRAY_ORACLE,
}

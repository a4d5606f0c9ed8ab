"""Window functions (SURVEY.md §2.4 — absent from the reference entirely).

Scale notes: every window here partitions by a bounded-cardinality key
(custkey/segment), so state per partition stays small; sort inside the window
is per-partition, not global. Running sums use decimal accumulation —
exact and order-independent, so results don't depend on whether the engine
evaluates the frame by streaming or segment tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment by price — the canonical row_number
    pattern; deterministic tie-break on orderkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.col("o_totalprice").alias("totalprice"), "rn")
    )


WINDOW_TOPK_ORACLE = """
SELECT c_mktsegment, o_orderkey, totalprice, rn FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend ordered by date — exact decimal cumsum."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("running_spend"),
    )


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders WHERE o_custkey < 100
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-to-previous-order per customer: lag/lead + datediff."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)).alias("days_since_prev"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
    )


WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(date_diff('day',
            lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INT) AS days_since_prev,
       lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders WHERE o_custkey < 100
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank on a column with real ties (l_quantity)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_quantity"), F.asc("l_linenumber"))
    wq = Window.partitionBy("l_orderkey").orderBy(F.desc("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(wq).alias("rnk"),
        F.dense_rank().over(wq).alias("dense_rnk"),
    )


WINDOW_RANK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity AS quantity,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber ASC) AS rn,
       RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS dense_rnk
FROM lineitem WHERE l_orderkey < 50
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of order price per customer — bounded frame."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("moving_avg_price"),
    )


WINDOW_MAVG_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg_price
FROM orders WHERE o_custkey < 100
"""


def window_gap_fill_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward (LOCF) over sparse attributes:
    first_value/last_value/lag with IGNORE NULLS — the standard gap-fill
    for sensor/event streams where most rows carry no value. One sort
    shuffle on the partition key; nulls synthesized with NULLIF since the
    test tables are fully populated. lag takes no frame clause (Spark
    rejects framed lag), so it gets its own window."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        F.expr("NULLIF(o_orderpriority, '1-URGENT')").alias("pri_nn"),
    )
    frame = (
        "PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return base.selectExpr(
        "o_custkey",
        "o_orderkey",
        f"first_value(pri_nn) IGNORE NULLS OVER ({frame}) AS first_pri",
        f"last_value(pri_nn) IGNORE NULLS OVER ({frame}) AS carried_pri",
        "lag(pri_nn) IGNORE NULLS OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_pri",
    )


WINDOW_GAP_FILL_ORACLE = """
SELECT o_custkey, o_orderkey,
       first_value(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS) OVER w AS first_pri,
       last_value(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS) OVER w AS carried_pri,
       lag(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS)
           OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_pri
FROM orders WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Dyadic EWMA (bit-exact exponential smoothing)
# --------------------------------------------------------------------------
#
# True EWMA is a per-row recursion SQL windows cannot express; the standard
# bounded form truncates the tail: y_t = sum_{k=0..7} x_{t-k} * 2^-(k+1).
# With alpha = 1/2 every weight is a DYADIC rational, and multiplying any
# IEEE double by 2^-n only shifts the exponent — EXACT, no rounding — so
# the smoothed series is bit-identical across engines (the reason
# deterministic trading/telemetry systems pick dyadic alphas). The weights
# are written as exact decimal literals; terms sum left-associated in the
# same order in both engines. Missing predecessors contribute 0.

_EWMA_DEPTH = 8
_EWMA_WEIGHTS = [2.0 ** -(k + 1) for k in range(_EWMA_DEPTH)]


def _ewma_expr(lag_fmt: str) -> str:
    """Engine-shared arithmetic chain; ``lag_fmt`` formats the k-th lagged
    value expression (k=0 is the current row)."""
    terms = [
        f"{lag_fmt.format(k=k)} * {w!r}" for k, w in enumerate(_EWMA_WEIGHTS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out}) + {t}"
    return out


def window_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing dyadic EWMA of event value per user, ordered (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = ev.select(
        "event_id",
        "user_id",
        "value",
        *[
            F.coalesce(F.lag("value", k).over(w), F.lit(0.0)).alias(f"x{k}")
            for k in range(1, _EWMA_DEPTH)
        ],
    )
    chain = _ewma_expr("x{k}").replace("x0", "value")
    return lags.select(
        "event_id", "user_id", "value", F.expr(chain).alias("ewma")
    )


def _ewma_oracle() -> str:
    chain = _ewma_expr("COALESCE(LAG(value, {k}) OVER w, 0.0)").replace(
        "COALESCE(LAG(value, 0) OVER w, 0.0)", "value"
    )
    return f"""
SELECT event_id, user_id, value, {chain} AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES = {
    "window_topk_per_group": window_topk_per_group,
    "window_gap_fill_ignore_nulls": window_gap_fill_ignore_nulls,
    "window_running_total": window_running_total,
    "window_lag_lead": window_lag_lead,
    "window_rank_dense": window_rank_dense,
    "window_moving_avg": window_moving_avg,
    "window_ewma_dyadic": window_ewma_dyadic,
}

ORACLES = {
    "window_topk_per_group": WINDOW_TOPK_ORACLE,
    "window_gap_fill_ignore_nulls": WINDOW_GAP_FILL_ORACLE,
    "window_running_total": WINDOW_RUNNING_ORACLE,
    "window_lag_lead": WINDOW_LAG_ORACLE,
    "window_rank_dense": WINDOW_RANK_ORACLE,
    "window_moving_avg": WINDOW_MAVG_ORACLE,
    "window_ewma_dyadic": _ewma_oracle(),
}

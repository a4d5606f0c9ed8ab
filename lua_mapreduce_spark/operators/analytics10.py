"""Round-13 third wave: bottom-k quantile sketch, LSH radius search, and
the hour-of-day seasonal profile.

The reference (rohitjoshi/lua-mapreduce, 1,127 LoC of Lua TCP plumbing;
its one workload is word count, example/word-count-taskfile.lua:73-159)
has none of this surface — these queries extend the repo's sketch,
similarity and time-series families per the driver brief:

* ``agg_quantile_bottomk_sketch`` — a mergeable quantile sketch from a
  bottom-k-by-hash uniform sample (the SURVEY §7.4 KLL candidate,
  refined: a deterministic KLL compactor is arrival-order-dependent and
  therefore not oracle-replayable, while the bottom-k sample is
  order-FREE — bottom-k of a union is bottom-k of the concatenated
  samples — and keeps the same mergeable-summary contract).
* ``sim_range_radius_search`` — radius (range) search over the LSH
  candidate machinery: the ANN family answers top-k six ways but had no
  range-query face; radius per query = its exact k-th-neighbor distance
  (the k-distance convention, SF-invariant), recall gated in output.
* ``events_seasonal_profile`` — hour-of-day seasonal means per event
  type: the seasonality complement of events_holt_winters (which models
  level+trend but deliberately not the daily cycle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan
from lua_mapreduce_spark.functions.texthash import (
    md5_bigint_expr,
    oracle_md5_bigint_expr,
)

# --------------------------------------------------------------------------
# Bottom-k-by-hash quantile sketch (mergeable, order-free, exact-witnessed)
# --------------------------------------------------------------------------

_QBK_K = 256  # sample size (rank error ~ 1/sqrt(k) ~ 6% per quantile)
_QBK_QS = (10, 25, 50, 75, 90)  # probed quantiles (percent)


def agg_quantile_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch from a bottom-k-by-hash sample: keep
    the _QBK_K order rows with the SMALLEST md5(o_orderkey) — a uniform
    random sample that is deterministic, order-free, and mergeable
    (bottom-k of a union = bottom-k of the concatenated samples, the
    KMV property applied to sampling); estimate quantile q as the
    sample's ceil(q*k/100)-th order statistic of o_totalprice cents.
    The exact rank of every estimated value joins in from one
    conditional scan (the KMV exact-witness convention), so the output
    carries achieved_permille (the estimate's true rank) next to the
    target and the rank error in permille — sampling accuracy is a
    measured number per quantile, not a claim.

    Design note (SURVEY §7.4 item 6): the banked KLL-compactor idea was
    refined to this form because a deterministic KLL compaction is
    arrival-ORDER-dependent (which partition's elements compact first
    changes the survivors), so no engine-independent oracle could
    replay it; the bottom-k sample keeps the mergeable-summary contract
    and is exactly replayable.

    Scale shape: the sample is orderBy(hash).limit(k), which Spark
    executes as TakeOrderedAndProject — per-partition top-k heaps then
    a k-row driver merge, NO global sort; the bounded 256-row sample is
    localCheckpoint'd; the witness pass is ONE scan against the
    broadcast 5-row quantile table."""
    h = md5_bigint_expr("concat('qbk-', CAST(o_orderkey AS STRING))")
    orders = load_table(spark, sf_dir, "orders")
    sample = (
        orders.selectExpr(
            f"{h} AS h",
            "CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents",
        )
        .orderBy("h")
        .limit(_QBK_K)
        .localCheckpoint(eager=True)
    )
    wv = Window.orderBy("cents", "h")  # bounded 256-row relation
    ranked = sample.withColumn("sr", F.row_number().over(wv))
    qs = spark.createDataFrame(
        [(q,) for q in _QBK_QS], "q_pct INT"
    ).selectExpr(
        "CAST(q_pct AS BIGINT) AS q_pct",
        f"CAST((q_pct * {_QBK_K} + 99) DIV 100 AS BIGINT) AS idx",
    )
    quants = (
        qs.join(F.broadcast(ranked), F.col("idx") == F.col("sr"))
        .select("q_pct", F.col("cents").alias("est_value_cents"))
        .localCheckpoint(eager=True)
    )
    witness = (
        orders.selectExpr(
            "CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents"
        )
        .crossJoin(F.broadcast(quants))
        .groupBy("q_pct", "est_value_cents")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.expr(
                "CAST(SUM(CASE WHEN cents <= est_value_cents"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("exact_le"),
        )
    )
    return witness.select(
        "q_pct",
        "est_value_cents",
        F.expr("CAST(n_total AS BIGINT)").alias("n_total"),
        "exact_le",
        F.expr("exact_le * 1000 DIV n_total").alias("achieved_permille"),
        F.expr(
            "abs(exact_le * 1000 DIV n_total - q_pct * 10)"
        ).alias("err_permille"),
    )


def _qbk_oracle() -> str:
    h = oracle_md5_bigint_expr("concat('qbk-', CAST(o_orderkey AS VARCHAR))")
    return f"""
WITH sample AS (
  SELECT h, cents FROM (
    SELECT {h} AS h,
           CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
    FROM orders)
  ORDER BY h LIMIT {_QBK_K}),
ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, h) AS sr FROM sample),
qs AS (
  SELECT CAST(q_pct AS BIGINT) AS q_pct,
         CAST((q_pct * {_QBK_K} + 99) // 100 AS BIGINT) AS idx
  FROM (SELECT UNNEST([{", ".join(str(q) for q in _QBK_QS)}]) AS q_pct)),
quants AS (
  SELECT q_pct, cents AS est_value_cents
  FROM qs JOIN ranked ON idx = sr),
witness AS (
  SELECT q_pct, est_value_cents,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN CAST(round(o_totalprice * 100.0) AS BIGINT)
                            <= est_value_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS exact_le
  FROM orders CROSS JOIN quants
  GROUP BY 1, 2)
SELECT q_pct, est_value_cents, n_total, exact_le,
       exact_le * 1000 // n_total AS achieved_permille,
       abs(exact_le * 1000 // n_total - q_pct * 10) AS err_permille
FROM witness
"""


# --------------------------------------------------------------------------
# LSH radius (range) search with k-distance radii and gated recall
# --------------------------------------------------------------------------

_RR_K = 20  # radius per query = its exact k-th-neighbor distance


def sim_range_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search — report ALL neighbors within distance r,
    the ANN family's missing query shape next to its six top-k faces
    (exact / int8 / LSH / IVF / PQ / graph). Candidates come from the
    multitable hyperplane-LSH buckets (the NSW substrate — bucket
    collisions only, never all pairs) verified by exact integer
    squared-L2 <= r; the radius r is per-query its exact _RR_K-th
    neighbor distance (the k-distance convention — a fixed absolute
    radius would go empty or explode as SF changes the density, while
    the k-distance keeps every SF's answer set near k and the oracle
    replays it exactly). The full-scan truth pass defines r and audits
    recall; at production scale r is a known constant and that pass
    drops away, leaving only the bucketed candidate join.

    Output per query: the radius, the true in-radius count, the count
    the LSH candidates found, and recall in permille — the range-query
    recall of the SAME hash tables whose top-k recall
    sim_ann_multitable measures, so index quality is comparable across
    query shapes.

    Scale shape: one signature scan (shared memoized _nsw_base
    substrate when the graph-ANN family runs in the same process is
    NOT used here — the radius query needs no k-NN graph, so it calls
    the signature projection directly); the candidate join is the
    bounded-bucket LSH equi-join; the truth pass is corpus x 5 queries
    (audit + radius definition only)."""
    from lua_mapreduce_spark.operators.analytics7 import (
        _NSW_DIST_SPARK,
        _NSW_Q,
        _nsw_sigs,
        _nsw_stack,
    )

    q = _nsw_sigs(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < _NSW_Q).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    nodes = q.select("vec_id", "qv")
    # truth distances: corpus x |queries| (audit + radius definition)
    truth = (
        nodes.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(_NSW_DIST_SPARK).alias("d"))
    )
    wr = Window.partitionBy("query_id").orderBy("d", "vec_id")
    radii = (
        truth.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == _RR_K)
        .select("query_id", F.col("d").alias("radius"))
        .localCheckpoint(eager=True)
    )
    n_true = (
        truth.join(F.broadcast(radii), "query_id")
        .filter("d <= radius")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    # LSH candidates: bucket collisions between query and corpus rows
    long = _nsw_stack(q)
    qlong = long.filter(F.col("vec_id") < _NSW_Q).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"), "t", "sig"
    )
    cand = (
        qlong.join(long, ["t", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    found = (
        cand.join(nodes, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "vec_id", F.expr(_NSW_DIST_SPARK).alias("d"))
        .join(F.broadcast(radii), "query_id")
        .filter("d <= radius")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return (
        radii.join(n_true, "query_id")
        .join(found, "query_id", "left")
        .select(
            "query_id",
            "radius",
            F.expr("CAST(n_true AS BIGINT)").alias("n_true"),
            F.expr("CAST(COALESCE(n_found, 0) AS BIGINT)").alias("n_found"),
            F.expr(
                "COALESCE(n_found, 0) * 1000 DIV n_true"
            ).alias("recall_permille"),
        )
    )


def _radius_oracle() -> str:
    from lua_mapreduce_spark.operators.analytics6 import _QGRID_DUCK
    from lua_mapreduce_spark.operators.analytics7 import (
        _NSW_Q,
        _nsw_oracle_dist,
        _nsw_oracle_prelude,
    )

    sig_cols, unions = _nsw_oracle_prelude()
    d = _nsw_oracle_dist("q.qqv", "n.qv")
    return f"""
WITH sigs AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, {_QGRID_DUCK} AS qv,
         {sig_cols}
  FROM embeddings a),
long AS MATERIALIZED (
{unions}),
qs AS (SELECT vec_id AS query_id, qv AS qqv FROM sigs
       WHERE vec_id < {_NSW_Q}),
nodes AS (SELECT vec_id, qv FROM sigs),
truth AS MATERIALIZED (
  SELECT q.query_id, n.vec_id, CAST({d} AS BIGINT) AS dist
  FROM qs q CROSS JOIN nodes n
  WHERE n.vec_id <> q.query_id),
radii AS (
  SELECT query_id, dist AS radius FROM (
    SELECT query_id, dist,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM truth)
  WHERE rn = {_RR_K}),
n_true AS (
  SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM truth t JOIN radii r ON t.query_id = r.query_id
  WHERE t.dist <= r.radius GROUP BY 1),
cand AS (
  SELECT DISTINCT ql.vec_id AS query_id, l.vec_id AS vec_id
  FROM long ql JOIN long l ON ql.t = l.t AND ql.sig = l.sig
  WHERE ql.vec_id < {_NSW_Q} AND l.vec_id <> ql.vec_id),
found AS (
  SELECT c.query_id, CAST(COUNT(*) AS BIGINT) AS n_found
  FROM cand c
  JOIN truth t ON t.query_id = c.query_id AND t.vec_id = c.vec_id
  JOIN radii r ON r.query_id = c.query_id
  WHERE t.dist <= r.radius GROUP BY 1)
SELECT r.query_id, r.radius, n_true,
       CAST(COALESCE(n_found, 0) AS BIGINT) AS n_found,
       COALESCE(n_found, 0) * 1000 // n_true AS recall_permille
FROM radii r
JOIN n_true USING (query_id)
LEFT JOIN found USING (query_id)
"""


# --------------------------------------------------------------------------
# Hour-of-day seasonal profile (per-type daily-cycle means)
# --------------------------------------------------------------------------


def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: mean hourly volume
    by position in the daily cycle — the seasonality complement of
    events_holt_winters (level+trend, deliberately cycle-blind) and the
    input a seasonal-adjustment pass would subtract. Per (type, hod):
    the number of OBSERVED epoch-hours, total events, the integer-milli
    mean over observed hours, and an is_peak flag for the cycle's
    argmax hour (ties to the earliest hour — deterministic). Built on
    the epoch-hour grain shared with the CUSUM/Holt family, so all
    three time-series views agree on bucketing.

    Scale shape: one scan -> (type, hr) map-side-combined counts, then
    a second bounded rollup to (type, hod) — output is |types| x 24
    rows regardless of input volume; the peak flag is one window over
    that bounded relation."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) DIV 3600 AS BIGINT)").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("x"))
    prof = hourly.groupBy(
        "event_type", F.expr("CAST(hr % 24 AS BIGINT)").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.expr("CAST(SUM(x) AS BIGINT)").alias("total_events"),
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.desc(F.expr("total_events * 1000 DIV n_hours")), F.asc("hod")
    )
    return prof.select(
        "event_type",
        "hod",
        F.expr("CAST(n_hours AS BIGINT)").alias("n_hours"),
        "total_events",
        F.expr("total_events * 1000 DIV n_hours").alias("mean_milli"),
        (F.row_number().over(wp) == 1).alias("is_peak"),
    )


SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
prof AS (
  SELECT event_type, CAST(hr % 24 AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(x) AS BIGINT) AS total_events
  FROM hourly GROUP BY 1, 2)
SELECT event_type, hod, n_hours, total_events,
       total_events * 1000 // n_hours AS mean_milli,
       ROW_NUMBER() OVER (PARTITION BY event_type
                          ORDER BY total_events * 1000 // n_hours DESC,
                                   hod ASC) = 1 AS is_peak
FROM prof
"""


QUERIES = {
    "agg_quantile_bottomk_sketch": agg_quantile_bottomk_sketch,
    "sim_range_radius_search": sim_range_radius_search,
    "events_seasonal_profile": events_seasonal_profile,
}

ORACLES = {
    "agg_quantile_bottomk_sketch": _qbk_oracle(),
    "sim_range_radius_search": _radius_oracle(),
    "events_seasonal_profile": SEASONAL_ORACLE,
}

"""Scale-technique operators, wave 2 (round 7): bitmap set algebra,
bin-bucketed range joins, vectorized centroid aggregation, and log-width
length bucketing.

Like scale_ops.py, these demonstrate levers a 100 TB deployment pulls
explicitly, each with a full DuckDB value oracle:

- **Bitmap set algebra**: COUNT(DISTINCT) answers one set's size;
  audience-overlap questions (|A∩B|, |A∪B|, Jaccard) naively need
  self-joins over distinct sets. Packing members into 64-bit words keyed
  by ``id DIV 64`` makes intersection/union a bitwise AND/OR on
  co-grouped words — one map-side-combinable shuffle, no Expand, no
  distinct self-join. (The same packing as ``agg_bitmap_distinct``,
  composed one level further.)
- **Bin-bucketed range join**: a value-vs-interval join is a
  BroadcastNestedLoopJoin — O(rows x ranges) — when expressed directly.
  Quantizing values into fixed-width bins and exploding each range into
  the bins it overlaps turns it into a hash EQUI-join on the bin id plus
  an exact residual filter. With 6 bands the nested loop would also have
  been fine; with the millions of ranges an IP-geo or genomics table
  carries, the equi-join rewrite is the difference between feasible and
  not. The residual filter keeps the result exact, so fp-overlap from
  coarse bins is a pure plan concern (the bloom-prefilter argument).
- **Per-label embedding centroids**: the reduce step behind k-means,
  class prototypes, and SemDeDup-style curation at corpus scale: explode
  (label, dim, quantized value) and sum per (label, dim) — map-side
  combinable, one shuffle of integer triples, output bounded by
  labels x dims. Values quantized to 1e-6 BIGINTs so the sums are exact
  and order-independent in both engines (the _KM_QV convention,
  similarity.py).
- **Log-width length buckets**: curriculum/balance reporting over doc
  lengths. Equal-frequency deciles (ntile) need a GLOBAL sort — one
  reducer sees every row; log2-width buckets assign map-side (bucket =
  LENGTH(BIN(n_tokens)), integer-exact in both engines), aggregate
  map-side-combinably, and the cumulative curriculum position is a
  window over the <= ~15 bucket rows.

The reference engine has no analogue for any of these (its one workload
is word count, example/word-count-taskfile.lua:73-159); they extend the
north-star pipeline surface. Everything is built-in-function only — zero
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan
from lua_mapreduce_spark.functions.texthash import oracle_words_expr, words_expr

# --------------------------------------------------------------------------
# Bitmap set algebra: audience overlap between two event-type user sets
# --------------------------------------------------------------------------

_BM_SET_A = "signup"
_BM_SET_B = "purchase"


def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact |A|, |B|, |A∩B|, |A∪B| and Jaccard (permille) between the
    signup-user and purchase-user sets, via packed 64-bit bitmap words.

    One conditional bit_or aggregation builds BOTH sets' words in a single
    shuffle keyed on ``user_id DIV 64`` (map-side combinable — partial
    words OR together); intersection and union are then bitwise AND/OR on
    the co-grouped words, popcounted and summed. State is bounded by
    max_user_id / 64 words regardless of event count; contrast with the
    COUNT(DISTINCT)-per-set + distinct-self-join formulation, which
    shuffles every distinct member twice and Expands the fact scan.

    Assumes non-negative member ids (holds for every id column in this
    schema): with signed ids, truncating DIV and % pair up differently
    than floor semantics — a deployment with negative keys would switch
    both to pmod/floor-div together."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_BM_SET_A, _BM_SET_B)
    )
    one = "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
    words = ev.groupBy(F.expr("user_id DIV 64").alias("w")).agg(
        F.expr(
            f"bit_or(IF(event_type = '{_BM_SET_A}', {one}, CAST(0 AS BIGINT)))"
        ).alias("a"),
        F.expr(
            f"bit_or(IF(event_type = '{_BM_SET_B}', {one}, CAST(0 AS BIGINT)))"
        ).alias("b"),
    )
    # COALESCE + the n_any = 0 guard keep the degenerate zero-event input
    # parity-checkable: Spark's agg over an EMPTY words relation yields one
    # all-NULL row, where the oracle's scalar subqueries yield zeros — and
    # both engines would otherwise hit a NULL/zero division for jaccard.
    return words.agg(
        F.expr("COALESCE(CAST(sum(bit_count(a)) AS BIGINT), 0)").alias("n_signup"),
        F.expr("COALESCE(CAST(sum(bit_count(b)) AS BIGINT), 0)").alias("n_purchase"),
        F.expr("COALESCE(CAST(sum(bit_count(a & b)) AS BIGINT), 0)").alias("n_both"),
        F.expr("COALESCE(CAST(sum(bit_count(a | b)) AS BIGINT), 0)").alias("n_any"),
    ).select(
        "n_signup",
        "n_purchase",
        "n_both",
        "n_any",
        F.expr("IF(n_any = 0, 0, (1000 * n_both) DIV n_any)").alias(
            "jaccard_permille"
        ),
    )


BITMAP_INTERSECT_ORACLE = f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{_BM_SET_A}'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = '{_BM_SET_B}'),
s AS (
  SELECT (SELECT COUNT(*) FROM a) AS n_signup,
         (SELECT COUNT(*) FROM b) AS n_purchase,
         (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS n_both,
         (SELECT COUNT(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS n_any)
SELECT n_signup, n_purchase, n_both, n_any,
       IF(n_any = 0, 0, (1000 * n_both) // n_any) AS jaccard_permille
FROM s
"""


# --------------------------------------------------------------------------
# Bin-bucketed range join: event values vs variable-width value bands
# --------------------------------------------------------------------------

# Exponential value bands in integer cents, [lo, hi). Literal and
# data-independent (like the q19 predicate constants); covers the full
# events.value domain at any SF (value is bounded by the generator).
_RB_BANDS = [(0, 64), (64, 256), (256, 1024), (1024, 4096), (4096, 16384), (16384, 1 << 20)]
_RB_BIN = 512  # cents per bin: each band explodes to (hi-lo)/512 bin rows


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band event counts/sums via the bin-bucketed range-join rewrite.

    Every band is exploded to the fixed-width bins it overlaps (sequence
    on ``DIV _RB_BIN``); facts compute their bin map-side and hash-join on
    the bin id; the exact BETWEEN residual filter then removes the
    coarse-bin false pairs, so the result equals the direct range join
    (which is the oracle). Integer cents make every comparison exact."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("v_c")
    )
    # Literal band table built JVM-side (stack over a 1-row relation): no
    # Python->RDD round trip per call, plans as a LocalRelation.
    stack_args = ", ".join(f"{lo}L, {hi}L" for lo, hi in _RB_BANDS)
    bands = spark.range(1).selectExpr(
        f"stack({len(_RB_BANDS)}, {stack_args}) AS (lo, hi)"
    )
    binned = bands.select(
        "lo",
        "hi",
        F.explode(
            F.expr(f"sequence(lo DIV {_RB_BIN}, (hi - 1) DIV {_RB_BIN})")
        ).alias("bin"),
    )
    return (
        ev.withColumn("bin", F.expr(f"v_c DIV {_RB_BIN}"))
        .join(F.broadcast(binned), "bin")
        .filter("v_c >= lo AND v_c < hi")
        .groupBy(F.col("lo").alias("band_lo"), F.col("hi").alias("band_hi"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(v_c) AS BIGINT)").alias("sum_cents"),
        )
    )


_RB_VALUES = ", ".join(f"({lo}, {hi})" for lo, hi in _RB_BANDS)

RANGE_BINNED_ORACLE = f"""
WITH ev AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS v_c FROM events),
bands(lo, hi) AS (VALUES {_RB_VALUES})
SELECT lo AS band_lo, hi AS band_hi,
       COUNT(*) AS n_events, CAST(SUM(v_c) AS BIGINT) AS sum_cents
FROM ev JOIN bands ON v_c >= lo AND v_c < hi
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Per-label embedding centroids (the k-means / class-prototype reduce)
# --------------------------------------------------------------------------

_VC_DIM = 64
_VC_QV = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"


def agg_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, dim, n, sum_micro, centroid): per-label mean embedding.

    Elements are quantized to 1e-6-unit BIGINTs (the _KM_QV convention)
    so the per-(label, dim) sums are exact integers — order-independent
    in both engines — and the centroid double is one deterministic IEEE
    division chain over exact operands. posexplode fans each vector into
    64 integer triples; the aggregation is map-side combinable and the
    output is bounded by labels x dims at any corpus size."""
    emb = parallelize_scan(spark, load_table(spark, sf_dir, "embeddings"))
    q = emb.select(
        "label", F.posexplode(F.expr(_VC_QV)).alias("dim", "q")
    )
    return q.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(q) AS BIGINT)").alias("sum_micro"),
    ).select(
        "label",
        "dim",
        "n",
        "sum_micro",
        F.expr("CAST(sum_micro AS DOUBLE) / n / 1000000.0").alias("centroid"),
    )


VECTOR_CENTROIDS_ORACLE = f"""
WITH q AS (
  SELECT label, d AS dim,
         CAST(round(CAST(embedding[d + 1] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings, range({_VC_DIM}) t(d))
SELECT label, dim, COUNT(*) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_micro,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0 AS centroid
FROM q GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Log-width token-length buckets (curriculum / balance reporting)
# --------------------------------------------------------------------------


def curation_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution in log2-width buckets with a cumulative
    curriculum position.

    bucket = LENGTH(BIN(n_tokens)) = floor(log2(n)) + 1, computed with
    integer/string builtins only (no transcendentals — the cross-engine
    exactness rule). Assignment is map-side, the per-bucket aggregate is
    map-side combinable, and the cumulative window runs over the <= ~15
    bucket rows — unlike ntile deciles, which force a global sort through
    one reducer. Output: bucket, token bounds, doc count, token mass,
    cumulative docs (the curriculum ordering a length-staged training
    schedule consumes)."""
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.expr(f"size({words_expr('text')})").alias("n_tokens")
    )
    buckets = toks.select(
        F.expr("LENGTH(BIN(n_tokens))").alias("bucket"), "n_tokens"
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("sum_tokens"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        "bucket",
        "n_docs",
        "min_tokens",
        "max_tokens",
        "sum_tokens",
        F.sum("n_docs").over(w).alias("cum_docs"),
    )


LENGTH_BUCKETS_ORACLE = f"""
WITH toks AS (
  SELECT len({oracle_words_expr("text")}) AS n_tokens FROM documents),
buckets AS (
  SELECT LENGTH(BIN(n_tokens)) AS bucket,
         COUNT(*) AS n_docs,
         MIN(n_tokens) AS min_tokens,
         MAX(n_tokens) AS max_tokens,
         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
  FROM toks GROUP BY 1)
SELECT bucket, n_docs, min_tokens, max_tokens, sum_tokens,
       CAST(SUM(n_docs) OVER (ORDER BY bucket
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_docs
FROM buckets
"""


# --------------------------------------------------------------------------
# Interval-overlap join via time-bin bucketing (session x error-burst)
# --------------------------------------------------------------------------

_OV_GAP_S = 1800  # session gap (the events_sessionize_gap_method contract)
_OV_BURST_MIN = 5  # errors per hour to qualify as a burst
_OV_BIN_S = 3600  # bin width: one hour


def interval_overlap_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join — which user sessions were active
    during an error burst — via the time-bin bucketing rewrite.

    Both interval sets are data-derived: sessions from the 30-minute-gap
    sessionization of the events stream, bursts as the [first_error_ts,
    last_error_ts] span of any hour with >= _OV_BURST_MIN errors.
    Expressed directly, overlap (s_start <= b_end AND s_end >= b_start)
    is a BroadcastNestedLoopJoin — O(sessions x bursts). Instead each
    session explodes to the hour bins it touches (sequence over truncated
    epochs — linear in session-hours, no cap needed), each burst lands in
    exactly ONE bin by construction, and the equi-join on the bin id plus
    the exact residual overlap filter reproduces the inequality join
    bit-for-bit (the oracle runs the direct inequality form). Per-bin
    fan-out is sessions-active-that-hour x (0 or 1) bursts, so the join
    output is linear in session-hours at any scale. Output: per burst
    hour, the burst size and how many sessions/users it hit."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        # Raw-timestamp interval comparison (not unix_timestamp diffs):
        # microsecond-exact in both engines, so a gap in (1800 s, 1801 s)
        # splits identically here and in the fractional-second oracle.
        ev.withColumn(
            "is_start",
            F.when(
                F.col("ts")
                > F.lag("ts").over(order_w)
                + F.expr(f"INTERVAL {_OV_GAP_S} SECONDS"),
                1,
            ).otherwise(
                F.when(F.lag("ts").over(order_w).isNull(), 1).otherwise(0)
            ),
        )
        .withColumn("session_seq", F.sum("is_start").over(run_w))
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    bursts = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("b_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.min("ts").alias("b_start"),
            F.max("ts").alias("b_end"),
        )
        .filter(F.col("n_errors") >= _OV_BURST_MIN)
        .withColumn(
            "bin", F.expr(f"unix_timestamp(b_hour) DIV {_OV_BIN_S}")
        )
    )
    sess_bins = sess.withColumn(
        "bin",
        F.explode(
            F.expr(
                f"sequence(unix_timestamp(date_trunc('hour', s_start)) DIV {_OV_BIN_S},"
                f" unix_timestamp(date_trunc('hour', s_end)) DIV {_OV_BIN_S})"
            )
        ),
    )
    return (
        sess_bins.join(bursts, "bin")
        .filter((F.col("s_start") <= F.col("b_end")) & (F.col("s_end") >= F.col("b_start")))
        .groupBy(
            F.date_format("b_hour", "yyyy-MM-dd HH").alias("burst_hour"),
            "n_errors",
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions_hit"),
            F.countDistinct("user_id").alias("n_users_hit"),
        )
    )


INTERVAL_OVERLAP_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL '{_OV_GAP_S} seconds' THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1
              ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
labeled AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged),
sess AS (
  SELECT user_id, session_seq, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM labeled GROUP BY 1, 2),
bursts AS (
  SELECT date_trunc('hour', ts) AS b_hour, COUNT(*) AS n_errors,
         MIN(ts) AS b_start, MAX(ts) AS b_end
  FROM events WHERE event_type = 'error'
  GROUP BY 1 HAVING COUNT(*) >= {_OV_BURST_MIN})
SELECT strftime(b_hour, '%Y-%m-%d %H') AS burst_hour, n_errors,
       COUNT(*) AS n_sessions_hit,
       COUNT(DISTINCT user_id) AS n_users_hit
FROM sess JOIN bursts
  ON s_start <= b_end AND s_end >= b_start
GROUP BY 1, 2
"""


QUERIES = {
    "agg_bitmap_intersect": agg_bitmap_intersect,
    "range_join_binned": range_join_binned,
    "agg_vector_centroids": agg_vector_centroids,
    "curation_length_buckets": curation_length_buckets,
    "interval_overlap_join_binned": interval_overlap_join_binned,
}

ORACLES = {
    "agg_bitmap_intersect": BITMAP_INTERSECT_ORACLE,
    "range_join_binned": RANGE_BINNED_ORACLE,
    "agg_vector_centroids": VECTOR_CENTROIDS_ORACLE,
    "curation_length_buckets": LENGTH_BUCKETS_ORACLE,
    "interval_overlap_join_binned": INTERVAL_OVERLAP_ORACLE,
}

"""Late round-9 operator wave: lakehouse compaction planning, robust
(median/MAD) outlier detection, chi-square contingency testing, and
group-median imputation.

Like every operator module, these extend the reference's single
map-shuffle-reduce surface (SURVEY.md §2.4's capability matrix — the
reference has no joins or statistics at all, lua-mapreduce-server.lua:
269-291 drives a one-input dataflow) with query shapes a production lake
needs, each re-expressed Spark-first with a DuckDB oracle.

Exactness conventions (the repo house rules): integer arithmetic
everywhere (cents / half-cent / quarter-cent scaling so exact medians
stay integer-valued, truncating DIV), `percentile` = DuckDB
`quantile_cont` (both (n-1)p interpolation, bit-exact on integers well
below 2^53), DuckDB SUMs cast back to BIGINT so no HUGEINT reaches the
driver's typed hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table

# --------------------------------------------------------------------------
# File-compaction planner (lakehouse OPTIMIZE / small-file bin-packing)
# --------------------------------------------------------------------------

_COMPACT_TARGET = 8192  # target output-file size, chars (stand-in for bytes)


def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan for a small-file manifest — the lakehouse
    OPTIMIZE primitive: given per-file sizes (here one "file" per
    document, size = n_chars), assign files to target-sized output bins
    and report the plan. Bin assignment is the scalable streaming form:
    within each table partition (lang), order files deterministically
    (source, doc_id), take the running cumulative size, and bin by the
    file's STARTING offset DIV target — one window per partition, no
    global sort, no sequential first-fit loop, and files from the same
    source stay adjacent (locality-preserving packing).

    Scale shape: a compaction planner runs over the file MANIFEST
    (millions of rows for a 100 TB table), never the data; the plan
    here is one partitioned window over the listing. Real compactors
    (Delta OPTIMIZE, Iceberg rewrite_data_files) use exactly this
    cumulative-offset binning per partition so the plan itself
    parallelizes. Output is one row per (lang, bin): file count, bin
    bytes, and the source range the bin covers — output size scales as
    total_bytes / target, never as the file count."""
    files = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "doc_id",
        F.expr("CAST(n_chars AS BIGINT)").alias("bytes"),
    )
    planned = files.select(
        "lang",
        "source",
        "bytes",
        F.expr(
            f"CAST((SUM(bytes) OVER (PARTITION BY lang ORDER BY source, "
            f"doc_id ROWS UNBOUNDED PRECEDING) - bytes) DIV "
            f"{_COMPACT_TARGET} AS BIGINT)"
        ).alias("bin"),
    )
    return planned.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.expr("CAST(SUM(bytes) AS BIGINT)").alias("bin_bytes"),
        F.min("source").alias("first_source"),
        F.max("source").alias("last_source"),
    )


COMPACTION_ORACLE = f"""
WITH planned AS (
  SELECT lang, source, CAST(n_chars AS BIGINT) AS bytes,
         CAST((SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang
               ORDER BY source, doc_id ROWS UNBOUNDED PRECEDING)
               - n_chars) // {_COMPACT_TARGET} AS BIGINT) AS bin
  FROM documents)
SELECT lang, bin, COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       MIN(source) AS first_source, MAX(source) AS last_source
FROM planned GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Robust outlier detection: median / MAD (median absolute deviation)
# --------------------------------------------------------------------------

_MAD_K = 5  # flag |v - median| > K * MAD (K=5 ~ 3.4 sigma for normal data)


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier counts via median/MAD — the
    outlier detector that, unlike z-scores (events_anomaly_hours),
    cannot be dragged by the outliers themselves (50% breakdown point
    vs 0%). Exactness trick: values are scaled to QUARTER-cents
    (4 x cents), so the even-count median (midpoint of two multiples
    of 4) is integer, deviations are even, and the MAD (midpoint of two
    evens) is integer too — the whole pipeline stays in exact BIGINT
    and the outlier predicate `dev > K * MAD` is an integer compare.

    Scale shape: exact medians are holistic, so the plan is two
    bounded-output aggregations (one row per event type) each
    broadcast-joined back to the fact rows — never a 5-partition
    window-over-type shuffle of the raw events (partition-per-type is
    the skew anti-pattern at 100 TB). At real scale you'd swap
    `percentile` for a mergeable sketch; the exact form is what the
    cross-engine gate can verify."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100.0) AS BIGINT) * 4").alias("v4"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(percentile(v4, 0.5) AS BIGINT)").alias("med4")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "v4", F.expr("abs(v4 - med4)").alias("dev4"), "med4"
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(percentile(dev4, 0.5) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(MIN(med4) AS BIGINT)").alias("med_qc"),
            F.expr("CAST(MIN(mad4) AS BIGINT)").alias("mad_qc"),
            F.expr(
                f"CAST(SUM(CASE WHEN dev4 > {_MAD_K} * mad4 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


MAD_ORACLE = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) * 4 AS v4
  FROM events),
med AS (
  SELECT event_type, CAST(quantile_cont(v4, 0.5) AS BIGINT) AS med4
  FROM ev GROUP BY 1),
dev AS (
  SELECT ev.event_type, v4, abs(v4 - med4) AS dev4, med4
  FROM ev JOIN med USING (event_type)),
mad AS (
  SELECT event_type, CAST(quantile_cont(dev4, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY 1)
SELECT event_type, COUNT(*) AS n_events,
       CAST(MIN(med4) AS BIGINT) AS med_qc,
       CAST(MIN(mad4) AS BIGINT) AS mad_qc,
       CAST(SUM(CASE WHEN dev4 > {_MAD_K} * mad4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Chi-square contingency test (segment x order-priority independence)
# --------------------------------------------------------------------------


def agg_chisquare_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the mktsegment x
    orderpriority contingency table, in exact integer centi-units:
    expected counts exp_c = (100 * row_total * col_total) DIV N, cell
    contribution = (100 * observed - exp_c)^2 DIV max(exp_c, 1) — both
    engines replay the identical truncating-integer formula, so parity
    is exact (and the result is chi-square x100 up to the shared
    truncation). Magnitudes stay far below 2^63 through sf100.

    Scale shape: ONE key join (orders -> customer segment) + ONE
    groupBy builds the 25-row cell table; margins and the statistic are
    window sums OVER that bounded cell table, so everything after the
    first aggregation is constant-size work. This is the categorical
    association test a feature-selection / drift-detection pass runs
    per column pair. Output: one row per segment with its chi-square
    contribution (sums across segments = the full statistic)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cells = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with_margins = cells.select(
        "c_mktsegment",
        "n",
        F.expr("SUM(n) OVER (PARTITION BY c_mktsegment)").alias("r_tot"),
        F.expr("SUM(n) OVER (PARTITION BY o_orderpriority)").alias("c_tot"),
        F.expr("SUM(n) OVER ()").alias("grand"),
    )
    contrib = with_margins.select(
        "c_mktsegment",
        "n",
        F.expr(
            "CAST(((100 * n - (100 * r_tot * c_tot) DIV grand) * "
            "(100 * n - (100 * r_tot * c_tot) DIV grand)) DIV "
            "GREATEST((100 * r_tot * c_tot) DIV grand, 1) AS BIGINT)"
        ).alias("cell_chi2_centi"),
    )
    return contrib.groupBy("c_mktsegment").agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("n_orders"),
        F.expr("CAST(SUM(cell_chi2_centi) AS BIGINT)").alias("chi2_centi"),
    )


CHISQUARE_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
margins AS (
  SELECT c_mktsegment, n,
         SUM(n) OVER (PARTITION BY c_mktsegment) AS r_tot,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS c_tot,
         SUM(n) OVER () AS grand
  FROM cells),
contrib AS (
  SELECT c_mktsegment, n,
         CAST(((100 * n - (100 * r_tot * c_tot) // grand) *
               (100 * n - (100 * r_tot * c_tot) // grand)) //
              GREATEST((100 * r_tot * c_tot) // grand, 1) AS BIGINT)
           AS cell_chi2_centi
  FROM margins)
SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(cell_chi2_centi) AS BIGINT) AS chi2_centi
FROM contrib GROUP BY 1
"""


# --------------------------------------------------------------------------
# Group-median imputation (ML feature prep: fill missing with group stats)
# --------------------------------------------------------------------------

_IMPUTE_MOD = 13  # every 13th event's value is treated as missing


def curation_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the standard ML-prep fill for missing
    numerics: rows whose value is missing (derived deterministically
    in-query: event_id % 13 == 0, so the oracle replays the mask) take
    the per-event-type median of the PRESENT values. Half-cent scaling
    (2 x cents, all even) keeps the even-count median integer, so the
    imputed sum is exact BIGINT end to end.

    Scale shape: one bounded-output aggregation (a median per event
    type, computed only over present rows) broadcast back into a single
    map-side fill pass — never a per-type window over the fact table.
    Output: per type, row/missing counts, the imputed fill value, and
    the post-imputation sum (in half-cents)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"event_id % {_IMPUTE_MOD} = 0").alias("missing"),
        F.expr("CAST(round(value * 100.0) AS BIGINT) * 2").alias("v2"),
    )
    med = (
        ev.filter(~F.col("missing"))
        .groupBy("event_type")
        .agg(F.expr("CAST(percentile(v2, 0.5) AS BIGINT)").alias("fill2"))
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                "CAST(SUM(CASE WHEN missing THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_imputed"),
            F.expr("CAST(MIN(fill2) AS BIGINT)").alias("fill_halfcents"),
            F.expr(
                "CAST(SUM(CASE WHEN missing THEN fill2 ELSE v2 END) AS BIGINT)"
            ).alias("sum_halfcents"),
        )
    )


IMPUTE_ORACLE = f"""
WITH ev AS (
  SELECT event_type, event_id % {_IMPUTE_MOD} = 0 AS missing,
         CAST(round(value * 100.0) AS BIGINT) * 2 AS v2
  FROM events),
med AS (
  SELECT event_type, CAST(quantile_cont(v2, 0.5) AS BIGINT) AS fill2
  FROM ev WHERE NOT missing GROUP BY 1)
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN missing THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
       CAST(MIN(fill2) AS BIGINT) AS fill_halfcents,
       CAST(SUM(CASE WHEN missing THEN fill2 ELSE v2 END) AS BIGINT)
         AS sum_halfcents
FROM ev JOIN med USING (event_type)
GROUP BY 1
"""


QUERIES = {
    "layout_compaction_bins": layout_compaction_bins,
    "events_mad_outliers": events_mad_outliers,
    "agg_chisquare_contingency": agg_chisquare_contingency,
    "curation_impute_group_median": curation_impute_group_median,
}

ORACLES = {
    "layout_compaction_bins": COMPACTION_ORACLE,
    "events_mad_outliers": MAD_ORACLE,
    "agg_chisquare_contingency": CHISQUARE_ORACLE,
    "curation_impute_group_median": IMPUTE_ORACLE,
}

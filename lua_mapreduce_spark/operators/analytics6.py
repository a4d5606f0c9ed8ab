"""Round-11 operator wave: embedding-space clustering (Lloyd's k-means).

The north-star brief's similarity/curation rows need a CLUSTERING
primitive beyond assignment-to-fixed-centroids (sim_ivf_topk and
dedup_semantic_semdedup assign to deterministic seed centroids but never
ITERATE): corpus clustering — topic balancing, SemDeDup's k-means stage,
IVF index training — is Lloyd's algorithm, the canonical iterative
refinement. This module expresses it Spark-first with a full DuckDB value
oracle by keeping every quantity on an integer grid.

Reference context: the reference engine (lua-mapreduce, 2012) has no
vector surface at all (one workload: word count,
example/word-count-taskfile.lua:73-159); this extends SURVEY.md §2.4's
similarity-search row the way the brief's training-data-pipeline list
specifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan

_KM_K = 8  # clusters (matches the IVF/SemDeDup cell count)
_KM_ROUNDS = 2  # Lloyd update rounds (unrolled; assignment after each)
_KM_SCALE = 10000  # global int grid: q = floor(v * SCALE + 0.5)
_KM_DIM = 64  # embedding width (TESTDATA.md)

# One GLOBAL grid, not sim_quantized_topk's per-vector max-abs scale:
# k-means compares DISTANCES BETWEEN vectors, so every coordinate must sit
# on the same lattice or the integer arithmetic stops being a metric.
_QGRID_SPARK = (
    "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
    f" * {_KM_SCALE} + 0.5) AS BIGINT))"
)
_QGRID_DUCK = (
    "list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
    f" * {_KM_SCALE} + 0.5) AS BIGINT))"
)

_SQDIST_SPARK = (
    "aggregate(zip_with(qv, cvec, (x, y) -> (x - y) * (x - y)),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)
_SQDIST_DUCK = (
    "list_sum(list_transform(list_zip(qv, cvec),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])))"
)


def _km_assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, label, qv, cid, dist): each vector joined to its nearest
    centroid. The centroid relation is K rows — broadcast cross join, then
    the per-vector argmin is rn=1 over (dist, cid), which compiles to
    WindowGroupLimit: every map task truncates its K-row group before the
    exchange, so the shuffle carries one row per vector, not K."""
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", F.expr(_SQDIST_SPARK))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn", "cvec")
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-dimension truncated mean of the assigned
    vectors, back on the SAME integer grid (sum DIV count — Spark DIV and
    DuckDB // both truncate toward zero, verified; counts are positive so
    the two agree even for negative sums). posexplode fans each vector
    into (cid, pos, val) rows that partial-aggregate map-side down to
    K*DIM groups; the bounded collect_list(struct(pos, dim)) reassembles
    <= DIM elements per centroid."""
    dims = (
        assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.expr("CAST(SUM(val) DIV COUNT(*) AS BIGINT)").alias("dim"))
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "dim"))),
            lambda s: s["dim"],
        ).alias("cvec")
    )


def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table, DETERMINISTIC end to
    end so the oracle replays every round bit-for-bit: vectors quantized
    to one global integer grid, init = the K lowest vec_ids (the seeded
    deterministic choice every engine can reproduce), per-round
    assignment by exact integer squared-L2 with (dist, cid) tiebreak,
    per-round update by truncated integer mean. _KM_ROUNDS update rounds
    unrolled (the BPE-merge convention: a fixed-depth iterative operator
    whose oracle unrolls the same CTE chain), then a final assignment
    against the settled centroids feeds the report: per-cluster size,
    inertia (the k-means objective), centroid checksum, and the dominant
    ground-truth label with its count (clustering-vs-label agreement —
    the purity signal an embedding-quality pipeline watches).

    Scale shape: each round is one broadcast cross join against K rows +
    one WindowGroupLimit shuffle (one row per vector) + one posexplode
    partial-agg whose exchange carries only K*DIM rows; centroid
    relations are localCheckpoint'd per round (8 rows — the graph-loop
    lineage-cut convention), so round r never recomputes rounds 1..r-1.
    Labels ride along the assignment; nothing driver-side."""
    q = parallelize_scan(
        spark,
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.expr(_QGRID_SPARK).alias("qv"),
        ),
    )
    cent = (
        q.filter(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cvec"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_KM_ROUNDS):
        cent = _km_update(_km_assign(q, cent)).localCheckpoint(eager=True)
    final = _km_assign(q, cent)
    stats = final.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr("CAST(SUM(dist) AS BIGINT)").alias("inertia"),
    )
    purity = (
        final.groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n_lab"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(
                    F.desc("n_lab"), F.asc("label")
                )
            ),
        )
        .filter("rn = 1")
        .select("cid", F.col("label").alias("dominant_label"),
                F.col("n_lab").alias("n_dominant"))
    )
    csum = cent.select(
        "cid",
        F.expr(
            "aggregate(cvec, CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("c_checksum"),
    )
    return (
        stats.join(purity, "cid")
        .join(F.broadcast(csum), "cid")
        .select(
            "cid", "n_vecs", "inertia", "c_checksum",
            "dominant_label", "n_dominant",
        )
    )


def _km_oracle() -> str:
    """Unrolled-round CTE chain (the BPE-learn oracle convention)."""
    parts = [
        f"""q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, {_QGRID_DUCK} AS qv
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cid, qv AS cvec FROM q WHERE vec_id < {_KM_K})"""
    ]
    for r in range(_KM_ROUNDS):
        parts.append(
            f"""a{r} AS (
  SELECT vec_id, label, qv, cid, dist FROM (
    SELECT q.vec_id, q.label, q.qv, c.cid, {_SQDIST_DUCK} AS dist,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQDIST_DUCK}, c.cid) AS rn
    FROM q CROSS JOIN c{r} c)
  WHERE rn = 1),
c{r + 1} AS (
  SELECT cid, list(dim ORDER BY pos) AS cvec FROM (
    SELECT cid, t.pos, CAST(SUM(qv[t.pos + 1]) // COUNT(*) AS BIGINT) AS dim
    FROM a{r} CROSS JOIN (SELECT UNNEST(range({_KM_DIM})) AS pos) t
    GROUP BY cid, t.pos)
  GROUP BY cid)"""
        )
    rr = _KM_ROUNDS
    parts.append(
        f"""fin AS (
  SELECT vec_id, label, cid, dist FROM (
    SELECT q.vec_id, q.label, c.cid, {_SQDIST_DUCK} AS dist,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQDIST_DUCK}, c.cid) AS rn
    FROM q CROSS JOIN c{rr} c)
  WHERE rn = 1),
stats AS (
  SELECT cid, COUNT(*) AS n_vecs, CAST(SUM(dist) AS BIGINT) AS inertia
  FROM fin GROUP BY 1),
purity AS (
  SELECT cid, label AS dominant_label, n_lab AS n_dominant FROM (
    SELECT cid, label, COUNT(*) AS n_lab,
           ROW_NUMBER() OVER (PARTITION BY cid
                              ORDER BY COUNT(*) DESC, label) AS rn
    FROM fin GROUP BY cid, label)
  WHERE rn = 1),
csum AS (
  SELECT cid, CAST(list_sum(cvec) AS BIGINT) AS c_checksum FROM c{rr})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT cid, n_vecs, inertia, c_checksum, dominant_label, n_dominant
FROM stats JOIN purity USING (cid) JOIN csum USING (cid)"""
    )


KMEANS_ORACLE = _km_oracle()


# --------------------------------------------------------------------------
# Zone-map data-skipping estimator (the quantified z-order motivation)
# --------------------------------------------------------------------------

_ZM_FILES = 32  # files per layout
_ZM_PREDS = 10  # probe predicates (decile ranges, half-decile width)


def layout_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) data-skipping estimator: how many
    files of a layout can a range predicate PROVABLY skip without
    reading them — the arithmetic every lakehouse scan planner runs
    against parquet footers / Delta file stats, and the quantitative WHY
    behind layout_zorder_keys and layout_compaction_rewrite.

    Two deterministic layouts of the documents table are compared under
    the SAME probe workload: ``ordered`` files hold contiguous doc_id
    ranges (file = doc_id DIV ceil(n/32) — what a sequential ingest
    writer produces), ``striped`` files hold doc_id % 32 (hash/round-robin
    placement). Ten decile range predicates probe both. Ordered zone maps
    are tight — most files' [min, max] misses the probe range and the
    skip ratio approaches (files - 1)/files; striped zone maps all span
    nearly the whole domain, so NOTHING skips — the measured reason
    clustering-by-filter-column matters at 100 TB, where the difference
    is reading one file versus all of them. ``rows_scanned_ub`` (the sum
    of surviving files' row counts) against ``rows_selected`` (the exact
    answer) bounds the wasted I/O per layout; zone maps are sound, so
    scanned >= selected always (asserted in tests/test_round11.py).

    Scale shape: zone maps build in ONE pass (stack() fans each row to
    its two layout placements map-side, one groupBy over <= 2*32 file
    groups); the probe matrix is a bounded (2*32 x 10) broadcast cross
    join over MANIFEST rows; exact selectivities come from one scan with
    the 10-row predicate table broadcast. The 1-row domain-size aggregate
    is localCheckpoint'd (the refresh-offset convention)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mx = docs.agg(
        F.expr("CAST(MAX(doc_id) + 1 AS BIGINT)").alias("mx")
    ).localCheckpoint(eager=True)
    placed = docs.crossJoin(F.broadcast(mx)).selectExpr(
        "doc_id",
        f"doc_id DIV (1 + (mx - 1) DIV {_ZM_FILES}) AS f_ordered",
        f"doc_id % {_ZM_FILES} AS f_striped",
    )
    zones = (
        placed.selectExpr(
            "doc_id",
            "stack(2, 'ordered', f_ordered, 'striped', f_striped)"
            " AS (layout, file_id)",
        )
        .groupBy("layout", "file_id")
        .agg(
            F.expr("CAST(MIN(doc_id) AS BIGINT)").alias("min_id"),
            F.expr("CAST(MAX(doc_id) AS BIGINT)").alias("max_id"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    preds = (
        spark.range(_ZM_PREDS)
        .select(F.col("id").alias("pred_id"))
        .crossJoin(F.broadcast(mx))
        .selectExpr(
            "pred_id",
            f"(pred_id * mx) DIV {_ZM_PREDS} AS lo",
            f"(pred_id * mx) DIV {_ZM_PREDS} + (mx DIV 20) AS hi",
        )
    )
    probed = zones.crossJoin(F.broadcast(preds)).withColumn(
        "scanned", F.expr("max_id >= lo AND min_id < hi")
    )
    skip_stats = probed.groupBy("layout", "pred_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.expr(
            "CAST(SUM(CASE WHEN scanned THEN 0 ELSE 1 END) AS BIGINT)"
        ).alias("n_skipped"),
        F.expr(
            "CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT)"
        ).alias("rows_scanned_ub"),
    )
    truth = (
        docs.crossJoin(F.broadcast(preds))
        .filter("doc_id >= lo AND doc_id < hi")
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).alias("rows_selected"))
    )
    return skip_stats.join(truth, "pred_id", "left").select(
        "layout",
        "pred_id",
        "n_files",
        "n_skipped",
        F.expr("n_skipped * 1000 DIV n_files").alias("skip_permille"),
        "rows_scanned_ub",
        F.expr("CAST(COALESCE(rows_selected, 0) AS BIGINT)").alias(
            "rows_selected"
        ),
    )


ZONEMAP_ORACLE = f"""
WITH mx AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS mx FROM documents),
placed AS (
  SELECT doc_id,
         doc_id // (1 + (mx - 1) // {_ZM_FILES}) AS f_ordered,
         doc_id % {_ZM_FILES} AS f_striped
  FROM documents, mx),
zones AS (
  SELECT layout, file_id,
         CAST(MIN(doc_id) AS BIGINT) AS min_id,
         CAST(MAX(doc_id) AS BIGINT) AS max_id,
         COUNT(*) AS n_rows
  FROM (
    SELECT doc_id, 'ordered' AS layout, f_ordered AS file_id FROM placed
    UNION ALL
    SELECT doc_id, 'striped', f_striped FROM placed)
  GROUP BY 1, 2),
preds AS (
  SELECT q.pred_id,
         (q.pred_id * mx) // {_ZM_PREDS} AS lo,
         (q.pred_id * mx) // {_ZM_PREDS} + (mx // 20) AS hi
  FROM (SELECT UNNEST(range({_ZM_PREDS})) AS pred_id) q, mx),
skip_stats AS (
  SELECT layout, pred_id, COUNT(*) AS n_files,
         CAST(SUM(CASE WHEN max_id >= lo AND min_id < hi
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped,
         CAST(SUM(CASE WHEN max_id >= lo AND min_id < hi
                       THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned_ub
  FROM zones CROSS JOIN preds GROUP BY 1, 2),
truth AS (
  SELECT pred_id, COUNT(*) AS rows_selected
  FROM documents CROSS JOIN preds
  WHERE doc_id >= lo AND doc_id < hi GROUP BY 1)
SELECT layout, pred_id, n_files, n_skipped,
       n_skipped * 1000 // n_files AS skip_permille,
       rows_scanned_ub,
       CAST(COALESCE(rows_selected, 0) AS BIGINT) AS rows_selected
FROM skip_stats LEFT JOIN truth USING (pred_id)
"""


QUERIES = {
    "sim_kmeans_lloyd": sim_kmeans_lloyd,
    "layout_zonemap_skipping": layout_zonemap_skipping,
}

ORACLES = {
    "sim_kmeans_lloyd": KMEANS_ORACLE,
    "layout_zonemap_skipping": ZONEMAP_ORACLE,
}

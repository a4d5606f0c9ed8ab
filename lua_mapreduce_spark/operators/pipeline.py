"""Composite pipeline operators: TPC-H Q15 and the LLM-corpus curation
shapes that chain the text/dedup building blocks into end-to-end jobs
(SURVEY.md §2.4 north-star rows).

* q15_top_supplier        — aggregate-then-argmax against a derived view
  (the one remaining partsupp-free TPC-H shape not yet covered).
* text_corpus_curation    — the standard pre-training data curation pass:
  per-doc quality features + exact-dedup keep-first + threshold filters,
  all in one plan with a single fingerprint shuffle.
* dedup_cluster_components — connected components over the verified
  near-dup pair graph (MinHash-LSH output as edges) via iterative
  min-label propagation. The loop is driver-ORCHESTRATED (a scalar
  convergence count per iteration) but every step is a distributed
  join+agg; no row data ever reaches the driver. Near-dup components are
  shallow (diameter of a handful), so plain propagation converges in a
  few rounds; at extreme skew the large-star/small-star variant drops in
  without changing the contract. Oracle: DuckDB recursive CTE computing
  min-reachable-id per vertex — full value-level parity for an iterative
  graph algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan
from lua_mapreduce_spark.functions.exact import REVENUE, dsum_expr, dsum_sql
from lua_mapreduce_spark.functions.texthash import oracle_words_expr, words_expr
from lua_mapreduce_spark.operators.dedup import _minhash_oracle, dedup_minhash_lsh

# --------------------------------------------------------------------------
# TPC-H Q15: top supplier by quarterly revenue. The revenue relation is
# aggregated once and reused for both the max and the join (Spark reuses
# the exchange; the scalar max broadcasts). Ties on the max revenue return
# every tied supplier, per the spec.
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_expr(REVENUE, "total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        supplier.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dsum_sql(REVENUE, "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Corpus curation: quality features + exact-dedup keep-first + thresholds.
# One text scan computes fingerprint and all features in a single
# projection; keep-first is one window over the fingerprint shuffle; the
# quality thresholds are plain column predicates. This is the composition
# a real pre-training pipeline runs before tokenization.
# --------------------------------------------------------------------------

_MIN_ALPHA_RATIO = 0.6
_MIN_TOKENS = 20


def text_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    feats = docs.select(
        "doc_id",
        "lang",
        F.md5(normalized).alias("fingerprint"),
        F.size(F.expr("regexp_extract_all(text, '([A-Za-z])', 1)")).alias("n_alpha"),
        F.length("text").alias("n_chars"),
        F.size(F.expr(words_expr("text"))).alias("n_toks"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    alpha_ratio = F.col("n_alpha").cast("double") / F.col("n_chars").cast("double")
    return (
        feats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)  # exact-dedup representative
        .filter((alpha_ratio >= _MIN_ALPHA_RATIO) & (F.col("n_toks") >= _MIN_TOKENS))
        .select("doc_id", "lang", "n_toks", alpha_ratio.alias("alpha_ratio"))
    )


CURATION_ORACLE = rf"""
WITH feats AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS INT) AS n_alpha,
         LENGTH(text) AS n_chars,
         CAST(len({oracle_words_expr("text")}) AS INT) AS n_toks
  FROM documents),
kept AS (
  SELECT * FROM feats
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1)
SELECT doc_id, lang, n_toks,
       CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) AS alpha_ratio
FROM kept
WHERE CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) >= {_MIN_ALPHA_RATIO}
  AND n_toks >= {_MIN_TOKENS}
"""


# --------------------------------------------------------------------------
# Near-dup clustering: connected components over MinHash-LSH pairs.
# --------------------------------------------------------------------------

_MAX_LP_ITERS = 20


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every document in a verified near-dup pair;
    cluster_id = the minimum doc_id in the connected component. The only
    driver-side values are the per-iteration scalar convergence counts."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("u", "v")
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .persist()
    )
    converged = False
    try:
        for it in range(_MAX_LP_ITERS):
            nbr = (
                edges.join(labels, edges["v"] == labels["doc_id"])
                .groupBy("u")
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, labels["doc_id"] == nbr["u"], "left")
                .select(
                    labels["doc_id"].alias("doc_id"),
                    F.least(
                        labels["cluster_id"],
                        F.coalesce(nbr["nbr_min"], labels["cluster_id"]),
                    ).alias("cluster_id"),
                )
                .persist()
            )
            # Convergence is checked only every 2nd propagation step (and on
            # the final one): each check is a sequential driver-blocking job
            # launch, and min-label propagation is monotone, so a skipped
            # check can never mask convergence — it only defers detection by
            # one cheap extra step while halving job launches.
            if it % 2 == 1 or it == _MAX_LP_ITERS - 1:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "doc_id")
                    .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                    .count()
                )
                labels.unpersist()
                labels = new_labels
                if changed == 0:
                    converged = True
                    break
            else:
                labels.unpersist()
                labels = new_labels
        if not converged:
            # A component whose min-vertex eccentricity exceeds the cap
            # would otherwise get silently-wrong cluster_ids; fail loudly
            # instead (long near-dup chains are plausible in real corpora).
            raise RuntimeError(
                f"dedup_cluster_components did not converge in {_MAX_LP_ITERS} "
                "label-propagation iterations; raise _MAX_LP_ITERS or switch "
                "to the O(log n)-round large-star/small-star variant"
            )
        # Truncate lineage so the caches can be released immediately: the
        # checkpointed result is executor-resident and cleaned by Spark's
        # ContextCleaner once the returned DataFrame is garbage collected.
        return labels.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
        labels.unpersist()


CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh_pairs),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
FROM reach GROUP BY u
"""


QUERIES = {
    "q15_top_supplier": q15_top_supplier,
    "text_corpus_curation": text_corpus_curation,
    "dedup_cluster_components": dedup_cluster_components,
}

ORACLES = {
    "q15_top_supplier": Q15_ORACLE,
    "text_corpus_curation": CURATION_ORACLE,
    "dedup_cluster_components": CLUSTER_ORACLE,
}

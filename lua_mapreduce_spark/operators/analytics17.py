"""Round-14 fifth wave (the fourth refill pulled forward, SURVEY §7.4
items 41, 43, 44; item 42, the streaming Pareto snapshot, lives in
streaming_ops.py with the other streaming faces): Jaccard link
prediction, the bigram-surprisal perplexity proxy, and the boilerplate
cluster report.

The reference (rohitjoshi/lua-mapreduce, 1,127 LoC of Lua TCP plumbing;
its one workload is word count, example/word-count-taskfile.lua:73-159)
has none of this surface — these queries extend the repo's graph,
text-analysis and curation families per the driver brief:

* ``graph_jaccard_link_prediction`` — Liben-Nowell & Kleinberg 2003's
  strongest simple predictor: for every non-adjacent node pair the
  neighbor-set Jaccard in exact permille, top-k flagged — the
  prediction-grain complement of graph_common_neighbors.
* ``text_ngram_lm_perplexity_proxy`` — per-doc mean bigram surprisal
  under the corpus bigram model, with -log2 p replaced by the
  LENGTH(BIN(total DIV cnt)) doubling bucket (the transcendental-free
  convention) — the "how surprising is this doc" filter signal next
  to rarity and burstiness.
* ``curation_boilerplate_cluster_report`` — boilerplate at CLUSTER
  grain: docs grouped by their highest-DF boilerplate shingle, with
  per-cluster doc counts, source spread and mean length — the triage
  view the per-doc boilerplate flags hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan
from lua_mapreduce_spark.functions.texthash import oracle_words_expr, words_expr

# --------------------------------------------------------------------------
# Jaccard link prediction (non-adjacent pairs, neighbor-set overlap)
# --------------------------------------------------------------------------

_LP_TOPK = 5


def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the undirected view of the trade graph
    (Liben-Nowell & Kleinberg 2003): for every NON-adjacent unordered
    node pair sharing at least one neighbor, the neighbor-set Jaccard
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in exact permille — their measured
    strongest simple predictor — with the top _LP_TOPK pairs by
    (jaccard DESC, node_a, node_b) flagged as predictions. The
    prediction-grain complement of graph_common_neighbors (which
    scores EXISTING edges' embeddedness).

    Scale shape: everything runs on the <= 50-row shared capped edge
    relation and its <= 25-row degree table; the common-neighbor join
    keys on the shared neighbor; the rank window is over the <= 300
    candidate pairs (schema-bounded, never data-sized)."""
    from lua_mapreduce_spark.operators.analytics7 import _trade_edges_ck

    edges = _trade_edges_ck(spark, sf_dir)
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("w"))
        )
        .distinct()
    )
    deg = sym.groupBy("u").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("deg")
    )
    a, b = sym.alias("a"), sym.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.u") < F.col("b.u")),
        )
        .groupBy(
            F.col("a.u").alias("node_a"), F.col("b.u").alias("node_b")
        )
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_common"))
    )
    adj = sym.filter("u < w").select(
        F.col("u").alias("node_a"), F.col("w").alias("node_b")
    )
    cand = common.join(adj, ["node_a", "node_b"], "left_anti")
    da = deg.select(F.col("u").alias("node_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("node_b"), F.col("deg").alias("deg_b"))
    scored = (
        cand.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            F.expr("deg_a + deg_b - n_common").alias("n_union"),
            F.expr(
                "n_common * 1000 DIV (deg_a + deg_b - n_common)"
            ).alias("jaccard_permille"),
        )
    )
    wr = Window.orderBy(
        F.desc("jaccard_permille"), F.asc("node_a"), F.asc("node_b")
    )
    return scored.withColumn(
        "is_predicted", F.row_number().over(wr) <= _LP_TOPK
    )


def _lp_oracle() -> str:
    from lua_mapreduce_spark.operators.analytics7 import _SCC_FANOUT

    return f"""
WITH trade AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS n_lines
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
  GROUP BY 1, 2),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                 ORDER BY n_lines DESC, dst) AS rn
    FROM trade)
  WHERE rn <= {_SCC_FANOUT}),
sym AS MATERIALIZED (
  SELECT DISTINCT u, w FROM (
    SELECT src AS u, dst AS w FROM edges
    UNION ALL SELECT dst, src FROM edges)),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u),
common AS (
  SELECT a.u AS node_a, b.u AS node_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sym a JOIN sym b ON a.w = b.w AND a.u < b.u
  GROUP BY 1, 2),
cand AS (
  SELECT c.* FROM common c
  WHERE NOT EXISTS (SELECT 1 FROM sym s
                    WHERE s.u = c.node_a AND s.w = c.node_b)),
scored AS (
  SELECT node_a, node_b, n_common,
         da.deg + db.deg - n_common AS n_union,
         n_common * 1000 // (da.deg + db.deg - n_common)
           AS jaccard_permille
  FROM cand
  JOIN deg da ON da.u = node_a
  JOIN deg db ON db.u = node_b)
SELECT node_a, node_b, n_common, n_union, jaccard_permille,
       ROW_NUMBER() OVER (ORDER BY jaccard_permille DESC, node_a, node_b)
         <= {_LP_TOPK} AS is_predicted
FROM scored
"""


# --------------------------------------------------------------------------
# Bigram-surprisal perplexity proxy (doubling buckets, no logs)
# --------------------------------------------------------------------------


def text_ngram_lm_perplexity_proxy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document surprisal under the corpus bigram model, with the
    -log2 p term replaced by its DOUBLING BUCKET: surprisal(b) =
    LENGTH(BIN(total_bigrams DIV count(b))) ~ floor(log2(1/p)) + 1 —
    exact integers, no transcendentals (the repo's standing
    convention), monotone in true surprisal so the filter ORDERING a
    curation pass needs is preserved. surprisal_milli = the doc's mean
    bucket x1000 — template/boilerplate docs score low (their bigrams
    are corpus-common), word-soup scores high: the "how surprising"
    signal next to rarity (corpus-rare unigrams) and burstiness.

    Scale shape: one tokenize scan -> exploded (doc, bigram) rows;
    bigram counts are map-side combinable; the join back keys on
    bigram (the inverted-index shuffle every n-gram-grain statistic
    pays — the novelty-query shape); the per-doc rollup is map-side
    combinable; the 1-row total broadcasts."""
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    db = (
        docs.select("doc_id", F.expr(words_expr("text")).alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(l) - 2),"
                    " i -> concat(l[i], ' ', l[i+1]))"
                )
            ).alias("bg"),
        )
    )
    counts = db.groupBy("bg").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")
    )
    tot = counts.agg(
        F.expr("CAST(SUM(cnt) AS BIGINT)").alias("total")
    )
    return (
        db.join(counts, "bg")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                "CAST(LENGTH(BIN(total DIV cnt)) AS BIGINT)"
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_bigrams"),
            F.expr("CAST(SUM(s) AS BIGINT)").alias("total_surprisal"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "total_surprisal",
            F.expr("total_surprisal * 1000 DIV n_bigrams").alias(
                "surprisal_milli"
            ),
        )
    )


PERPLEXITY_ORACLE = f"""
WITH db AS (
  SELECT doc_id, bg FROM (
    SELECT doc_id, {oracle_words_expr("text")} AS l FROM documents) t,
    UNNEST(list_transform(range(1, len(l)),
           i -> l[i] || ' ' || l[i+1])) AS s(bg)
  WHERE len(l) >= 2),
counts AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM db GROUP BY bg),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(LENGTH(BIN(total // cnt)) AS BIGINT)) AS BIGINT)
         AS total_surprisal,
       CAST(SUM(CAST(LENGTH(BIN(total // cnt)) AS BIGINT)) AS BIGINT)
         * 1000 // CAST(COUNT(*) AS BIGINT) AS surprisal_milli
FROM db JOIN counts USING (bg) CROSS JOIN tot
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Boilerplate cluster report (docs grouped by top boilerplate shingle)
# --------------------------------------------------------------------------


def curation_boilerplate_cluster_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Boilerplate at CLUSTER grain: each doc containing one of the
    corpus's top boilerplate shingles (text_boilerplate_ngrams'
    _BOILER_TOPK highest-DF trigrams — SHARED constants, so cluster
    report and per-doc flag can never disagree about what counts as
    boilerplate) is assigned to its highest-DF such shingle (ties:
    shingle ASC), and each cluster reports doc count, distinct-source
    spread, and mean doc length — the "which template, how widespread,
    from where" triage the per-doc boiler_frac flags hide.

    Scale shape: one tokenize scan -> DISTINCT (doc, shingle) rows;
    the boilerplate head is a bounded top-k (TakeOrderedAndProject)
    joined back by shingle; the per-doc argmax compiles to
    WindowGroupLimit; the cluster rollup is <= _BOILER_TOPK rows."""
    from lua_mapreduce_spark.operators.curation import (
        _BOILER_N,
        _BOILER_TOPK,
        _shingles_expr,
    )

    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    tg = (
        docs.select(
            "doc_id",
            "source",
            F.length("text").alias("n_chars"),
            F.expr(words_expr("text")).alias("l"),
        )
        .filter(F.size("l") >= _BOILER_N)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.explode(F.expr(_shingles_expr(_BOILER_N))).alias("sg"),
        )
        .distinct()
    )
    top = (
        tg.groupBy("sg")
        .agg(F.expr("CAST(COUNT(DISTINCT doc_id) AS BIGINT)").alias("df"))
        .orderBy(F.desc("df"), F.asc("sg"))
        .limit(_BOILER_TOPK)
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("df"), F.asc("sg"))
    assigned = (
        tg.join(top, "sg")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
    )
    return (
        assigned.groupBy("sg", "df")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(COUNT(DISTINCT source) AS BIGINT)").alias(
                "n_sources"
            ),
            F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("total_chars"),
        )
        .select(
            F.col("sg").alias("shingle"),
            "df",
            "n_docs",
            "n_sources",
            "total_chars",
            F.expr("total_chars DIV n_docs").alias("mean_chars"),
        )
    )


def _bcr_oracle() -> str:
    from lua_mapreduce_spark.operators.curation import (
        _BOILER_N,
        _BOILER_TOPK,
        _oracle_shingles_expr,
    )

    return f"""
WITH toks AS (
  SELECT doc_id, source, LENGTH(text) AS n_chars,
         {oracle_words_expr("text")} AS l
  FROM documents),
tg AS (
  SELECT DISTINCT doc_id, source, n_chars, s.sg
  FROM toks, UNNEST({_oracle_shingles_expr(_BOILER_N)}) AS s(sg)
  WHERE len(l) >= {_BOILER_N}),
top AS (
  SELECT sg, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tg GROUP BY sg
  ORDER BY df DESC, sg LIMIT {_BOILER_TOPK}),
assigned AS (
  SELECT tg.doc_id, tg.source, tg.n_chars, tg.sg, top.df
  FROM tg JOIN top ON tg.sg = top.sg
  QUALIFY ROW_NUMBER() OVER (PARTITION BY tg.doc_id
                             ORDER BY top.df DESC, tg.sg) = 1)
SELECT sg AS shingle, df,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         AS mean_chars
FROM assigned
GROUP BY sg, df
"""


QUERIES = {
    "graph_jaccard_link_prediction": graph_jaccard_link_prediction,
    "text_ngram_lm_perplexity_proxy": text_ngram_lm_perplexity_proxy,
    "curation_boilerplate_cluster_report": curation_boilerplate_cluster_report,
}

ORACLES = {
    "graph_jaccard_link_prediction": _lp_oracle(),
    "text_ngram_lm_perplexity_proxy": PERPLEXITY_ORACLE,
    "curation_boilerplate_cluster_report": _bcr_oracle(),
}

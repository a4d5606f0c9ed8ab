"""Training-data curation operators beyond the reference's own surface
(north-star §2.4 rows): benchmark decontamination, Gopher-style repetition
filters, TF-IDF term weighting, and deterministic mixture sampling.

These are the standard passes an LLM pre-training pipeline runs between
raw-crawl ingestion and tokenization (decontaminate → repetition/quality
filter → weight/sample to a target source mixture); each is expressed as a
single declarative plan over the `documents` table with a full DuckDB
oracle. The reference engine has no analogue (its one workload is word
count, example/word-count-taskfile.lua:73-159); these compose the same
tokenize/shingle primitives its map/reduce contract exposes.

Everything is built-in-function only — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table, parallelize_scan
from lua_mapreduce_spark.functions.texthash import (
    md5_bigint_expr,
    oracle_md5_bigint_expr,
    oracle_words_expr,
    words_expr,
)

# --------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents sharing any word n-gram
# with a held-out benchmark set. Production pipelines use 8-13-gram overlap
# against eval benchmarks; the synthetic corpus is short word-soup (48-553
# chars), so _DECON_N is calibrated to 4 to keep the check non-vacuous
# (15 flagged docs at sf0.01). The benchmark slice is every 31st doc_id —
# a stand-in for the external benchmark table a real pipeline would load.
#
# 100 TB shape: ONE corpus scan shingled once; the benchmark side is tiny
# and bounded in production (eval suites are thousands of docs — the join
# auto-broadcasts under AQE), while here it derives from `documents`, so it
# stays an unhinted key join per the broadcast policy. Shingles join as
# strings for oracle exactness; at scale you'd join on md5_bigint(shingle)
# to cut shuffle bytes ~10x.
# --------------------------------------------------------------------------

_DECON_N = 4
_DECON_BENCH_MOD = 31


def _shingles_expr(n: int) -> str:
    """Spark SQL: array of space-joined word n-grams of the token array l."""
    return (
        f"transform(sequence(0, size(l) - {n}), i -> concat_ws(' ', slice(l, i + 1, {n})))"
    )


def _oracle_shingles_expr(n: int) -> str:
    """DuckDB twin of :func:`_shingles_expr` (1-based inclusive slices)."""
    return (
        f"list_transform(range(1, len(l) - {n} + 2),"
        f" i -> list_aggregate(l[i:i + {n} - 1], 'string_agg', ' '))"
    )


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", F.expr(words_expr("text")).alias("l"))
        .filter(F.size("l") >= _DECON_N)
        .select("doc_id", F.explode(F.expr(_shingles_expr(_DECON_N))).alias("sg"))
    )
    bench = (
        sh.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0)
        .groupBy("sg")
        .agg(F.min("doc_id").alias("bench_doc"))
    )
    corpus = sh.filter(F.col("doc_id") % _DECON_BENCH_MOD != 0)
    return (
        corpus.join(bench, "sg")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sg").alias("n_shared_shingles"),
            F.min("bench_doc").alias("first_bench_doc"),
        )
    )


DECONTAMINATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {oracle_words_expr("text")} AS l FROM documents),
sh AS (
  SELECT doc_id, s.sg
  FROM toks, unnest({_oracle_shingles_expr(_DECON_N)}) AS s(sg)
  WHERE len(l) >= {_DECON_N}),
bench AS (
  SELECT sg, MIN(doc_id) AS bench_doc FROM sh
  WHERE doc_id % {_DECON_BENCH_MOD} = 0 GROUP BY sg)
SELECT c.doc_id AS doc_id,
       COUNT(DISTINCT c.sg) AS n_shared_shingles,
       MIN(b.bench_doc) AS first_bench_doc
FROM sh c JOIN bench b ON c.sg = b.sg
WHERE c.doc_id % {_DECON_BENCH_MOD} <> 0
GROUP BY c.doc_id
"""


# --------------------------------------------------------------------------
# Gopher-style repetition features: fraction of duplicate tokens and the
# share of the most frequent bigram (Rae et al. 2021 use duplicate-line /
# top-n-gram fractions as removal signals; tokens stand in for lines in the
# newline-free synthetic corpus). The per-doc "most frequent bigram" is an
# array-lambda fold over the doc's own bigrams — O(u * n) per row on the
# JVM, no shuffle at all until the (absent) downstream consumer aggregates.
# All ratios are integer-count divisions → exact across engines.
# --------------------------------------------------------------------------

_REP_MAX_DUP_WORD_FRAC = 0.80
_REP_MAX_TOP_BIGRAM_FRAC = 0.08


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    bigrams = "transform(sequence(0, size(l) - 2), i -> concat(l[i], ' ', l[i+1]))"
    top_bigram_cnt = (
        "array_max(transform(array_distinct(bg), b -> size(filter(bg, x -> x = b))))"
    )
    feats = (
        docs.select("doc_id", F.expr(words_expr("text")).alias("l"))
        .filter(F.size("l") >= 2)
        .select("doc_id", "l", F.expr(bigrams).alias("bg"))
        .select(
            "doc_id",
            (
                (F.size("l") - F.size(F.array_distinct("l"))).cast("double")
                / F.size("l").cast("double")
            ).alias("dup_word_frac"),
            (
                F.expr(top_bigram_cnt).cast("double") / F.size("bg").cast("double")
            ).alias("top_bigram_frac"),
        )
    )
    return feats.select(
        "doc_id",
        "dup_word_frac",
        "top_bigram_frac",
        (
            (F.col("dup_word_frac") > _REP_MAX_DUP_WORD_FRAC)
            | (F.col("top_bigram_frac") > _REP_MAX_TOP_BIGRAM_FRAC)
        ).alias("flagged"),
    )


REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {oracle_words_expr("text")} AS l FROM documents),
feats AS (
  SELECT doc_id,
         CAST(len(l) - len(list_distinct(l)) AS DOUBLE)
           / CAST(len(l) AS DOUBLE) AS dup_word_frac,
         CAST(list_max(list_transform(list_distinct(bg),
                b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE)
           / CAST(len(bg) AS DOUBLE) AS top_bigram_frac
  FROM (SELECT doc_id, l,
               list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]) AS bg
        FROM toks WHERE len(l) >= 2))
SELECT doc_id, dup_word_frac, top_bigram_frac,
       (dup_word_frac > {_REP_MAX_DUP_WORD_FRAC}
        OR top_bigram_frac > {_REP_MAX_TOP_BIGRAM_FRAC}) AS flagged
FROM feats
"""


# --------------------------------------------------------------------------
# TF-IDF term weighting, top terms per document. idf is the RAW ratio
# N/df rather than ln(N/df): ln is a transcendental whose libm rounding
# differs across engines (excluded from oracles by project practice), and
# N/df is order-isomorphic to ln(N/df) for ranking, so top-k selection is
# identical. tfidf = (tf * N) / df evaluates exactly: tf*N is an exact
# integer product well inside double range, and the single division is
# IEEE-correctly-rounded in both engines.
#
# Plan: one tokenize scan → (doc, word) hash agg → word-level df agg →
# key join back + per-doc window top-k. The N scalar is a broadcast 1-row
# aggregate, never a driver round-trip.
# --------------------------------------------------------------------------

_TFIDF_TOPK = 3


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(words_expr("text"))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.desc("tf"), F.asc("word")
    )
    return (
        tf.join(df_rel, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") * F.col("n_docs").cast("double"))
            / F.col("df").cast("double"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOPK)
        .select("doc_id", "word", "tf", "df", "tfidf", "rnk")
    )


TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, w.word
  FROM documents, unnest({oracle_words_expr("text")}) AS w(word)),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
dfr AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfr.df,
         (CAST(tf.tf AS DOUBLE) * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE))
           / CAST(dfr.df AS DOUBLE) AS tfidf
  FROM tf JOIN dfr ON tf.word = dfr.word)
SELECT doc_id, word, tf, df, tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, tf DESC, word ASC) AS INT) AS rnk
FROM scored
QUALIFY rnk <= {_TFIDF_TOPK}
"""


# --------------------------------------------------------------------------
# Deterministic mixture sampling: down/up-weight sources to a target
# mixture by hash-gating each document, the way pre-training pipelines mix
# crawl/books/code at fixed ratios. The gate is a pure map-side predicate
# on md5(doc_id) — NO shuffle, NO sampling state, reproducible across
# retries and engines (Spark's `sample()` is seed-and-partition dependent,
# so it can't be oracle-checked; a hash gate can). `weight` is the
# inverse-propensity weight a loss-weighted trainer would consume.
#
# 100 TB shape: the predicate evaluates inside the scan stage and prunes
# rows before any exchange; adding a source column partition filter would
# push it into partition pruning.
# --------------------------------------------------------------------------

# Per-mille keep rates by source; sources absent from the map keep the
# default rate. Rates are a demo mixture (one full-keep source, one
# half-keep, one quarter-keep, long tail at 10%).
_MIX_RATES = {"src0": 1000, "src1": 500, "src2": 250}
_MIX_DEFAULT_RATE = 100
_MIX_SALT = "mix|"


def curation_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    rate = F.lit(_MIX_DEFAULT_RATE)
    for src, r in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    gate = F.expr(md5_bigint_expr(f"concat('{_MIX_SALT}', CAST(doc_id AS STRING))"))
    return (
        docs.withColumn("rate", rate)
        .filter(F.pmod(gate, F.lit(1000)) < F.col("rate"))
        .select(
            "doc_id",
            "source",
            (F.lit(1000.0) / F.col("rate").cast("double")).alias("weight"),
        )
    )


_MIX_RATE_SQL = "CASE " + " ".join(
    f"WHEN source = '{src}' THEN {r}" for src, r in sorted(_MIX_RATES.items())
) + f" ELSE {_MIX_DEFAULT_RATE} END"

MIXTURE_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, source, {_MIX_RATE_SQL} AS rate,
         {oracle_md5_bigint_expr(f"'{_MIX_SALT}' || CAST(doc_id AS VARCHAR)")} % 1000
           AS gate
  FROM documents)
SELECT doc_id, source, 1000.0 / CAST(rate AS DOUBLE) AS weight
FROM gated WHERE gate < rate
"""


# --------------------------------------------------------------------------
# Token chunking: split each document into fixed-size token windows with
# overlap — the context-window preparation step between curation and
# tokenization (chunk, then pack chunks into sequences). Chunks are emitted
# as text plus (doc_id, chunk_id, n_tokens) so a downstream tokenizer can
# consume them independently; the stride guarantees every token appears in
# at least one chunk and boundary tokens appear in two.
#
# 100 TB shape: map-side explode — rows fan out by ~len/stride with no
# shuffle at all; chunk outputs inherit the input partitioning, exactly
# what a pack-and-shuffle-later pipeline wants.
# --------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    # Chunk starts: 0, stride, 2*stride, ... up to the last index that
    # starts a non-empty chunk; a doc shorter than one chunk yields itself.
    # posexplode's position IS the chunk_id (start offset = pos * stride).
    starts = f"sequence(0, greatest(size(l) - 1, 0), {_CHUNK_STRIDE})"
    chunks = f"transform({starts}, s -> slice(l, s + 1, {_CHUNK_SIZE}))"
    return (
        docs.select("doc_id", F.expr(words_expr("text")).alias("l"))
        .filter(F.size("l") >= 1)
        .select("doc_id", F.posexplode(F.expr(chunks)).alias("chunk_id", "toks"))
        .select(
            "doc_id",
            "chunk_id",
            F.size("toks").alias("n_tokens"),
            F.concat_ws(" ", "toks").alias("chunk_text"),
        )
    )


CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {oracle_words_expr("text")} AS l FROM documents),
chunks AS (
  SELECT doc_id, l, u.s AS off
  FROM toks,
       unnest(range(0, greatest(len(l) - 1, 0) + 1, {_CHUNK_STRIDE})) AS u(s)
  WHERE len(l) >= 1)
SELECT doc_id,
       CAST(off // {_CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(l[off + 1:off + {_CHUNK_SIZE}]) AS INT) AS n_tokens,
       array_to_string(l[off + 1:off + {_CHUNK_SIZE}], ' ') AS chunk_text
FROM chunks
"""


# --------------------------------------------------------------------------
# Boilerplate detection: the corpus-wide most-frequent trigrams (by
# document frequency, deterministic tie-break) form a "boilerplate set";
# each document reports the fraction of its trigrams that land in the set.
# High-fraction docs are template/navigation boilerplate in a real crawl.
#
# 100 TB shape: phase 1 aggregates trigram->df and takes a LIMIT-K top
# set — provably bounded at K rows, so the phase-2 membership join
# auto-broadcasts under AQE (no hint needed; the unbounded-broadcast
# policy stays intact). Phase 2 is one explode + broadcast probe + one
# doc_id agg.
# --------------------------------------------------------------------------

_BOILER_N = 3
_BOILER_TOPK = 20


def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    tg = (
        docs.select("doc_id", F.expr(words_expr("text")).alias("l"))
        .filter(F.size("l") >= _BOILER_N)
        .select(
            "doc_id",
            F.explode(F.expr(_shingles_expr(_BOILER_N))).alias("sg"),
            F.size("l").alias("n_toks"),
        )
    )
    top = (
        tg.groupBy("sg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("sg"))
        .limit(_BOILER_TOPK)
        .select("sg", F.lit(1).alias("is_boiler"))
    )
    n_tg = (F.col("n_toks") - F.lit(_BOILER_N - 1)).cast("double")
    return (
        tg.join(top, "sg", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler"),
            F.min(n_tg).alias("n_trigrams"),  # constant per doc; min = exact
        )
        .select(
            "doc_id",
            F.col("n_boiler").cast("bigint").alias("n_boiler"),
            (F.col("n_boiler").cast("double") / F.col("n_trigrams")).alias(
                "boiler_frac"
            ),
        )
    )


BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {oracle_words_expr("text")} AS l FROM documents),
tg AS (
  SELECT doc_id, s.sg, len(l) - {_BOILER_N - 1} AS n_tg
  FROM toks, unnest({_oracle_shingles_expr(_BOILER_N)}) AS s(sg)
  WHERE len(l) >= {_BOILER_N}),
top AS (
  SELECT sg FROM (
    SELECT sg, COUNT(DISTINCT doc_id) AS df FROM tg GROUP BY sg)
  ORDER BY df DESC, sg ASC LIMIT {_BOILER_TOPK})
SELECT tg.doc_id AS doc_id,
       CAST(SUM(CASE WHEN top.sg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN top.sg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(MIN(tg.n_tg) AS DOUBLE) AS boiler_frac
FROM tg LEFT JOIN top ON tg.sg = top.sg
GROUP BY tg.doc_id
"""


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): lay the corpus's token stream out
# into fixed-budget context windows — the batching step between chunking
# and the trainer. Documents are concatenated in doc_id order within a
# shard and split at every _PACK_BUDGET-token boundary (GPT-style packing:
# a document may straddle two windows rather than leaving pad waste).
# Output maps each doc to its placement: shard, start offset in the
# shard's token stream, first window (seq_id), and how many windows it
# spans.
#
# 100 TB shape: ONE shuffle, keyed by shard (shard count scales with the
# cluster; doc_id-hash sharding keeps them even), then a per-shard
# sort + running sum — the exact partial-window aggregation pattern
# Tungsten spills gracefully. Placement is pure arithmetic on the running
# offset; no Python, no second pass, and the assignment is reproducible
# because (shard, doc_id) is a total order — Spark's coalesce/repartition
# nondeterminism can't change it.
# --------------------------------------------------------------------------

_PACK_BUDGET = 64  # tokens per packed sequence (context window)
_PACK_SHARDS = 8


def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No parallelize_scan here: the shard hash exchange below immediately
    # redistributes anyway, so a round-robin repartition would only add a
    # second shuffle. n_tokens rides the scan stage, which at real scale has
    # >= cores input splits.
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).alias("shard"),
        F.size(F.expr(words_expr("text"))).alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    placed = sized.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    first_seq = F.expr(f"start_off DIV {_PACK_BUDGET}")
    last_seq = F.expr(f"(start_off + n_tokens - 1) DIV {_PACK_BUDGET}")
    return placed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_off",
        first_seq.alias("seq_id"),
        (last_seq - first_seq + F.lit(1)).alias("n_seqs"),
    )


PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len({oracle_words_expr("text")}) AS INT) AS n_tokens
  FROM documents),
placed AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off
  FROM sized WHERE n_tokens >= 1)
SELECT doc_id, shard, n_tokens, start_off,
       start_off // {_PACK_BUDGET} AS seq_id,
       ((start_off + n_tokens - 1) // {_PACK_BUDGET})
         - (start_off // {_PACK_BUDGET}) + 1 AS n_seqs
FROM placed
"""


# --------------------------------------------------------------------------
# Inverted index (posting lists): term -> document frequency, total term
# frequency, and a capped sorted posting list — the retrieval-side index a
# dedup/search/attribution pipeline builds over the curated corpus. The
# min-df floor drops the hapax tail (the bulk of the vocabulary) and the
# posting cap bounds the hot-term rows (stopword lists would otherwise be
# corpus-sized), so output row width is bounded at any corpus scale.
#
# 100 TB shape: tokenize scan -> (word, doc) hash agg (map-side partials
# collapse per-doc repeats) -> word-level agg. collect_list here is
# per-WORD after the df floor and gets sliced to _POSTINGS_CAP; the full
# uncapped variant is `write_inverted_index` below, which never
# aggregates a posting list into one row — it writes the posting ROWS as
# term-clustered parquet instead.
# --------------------------------------------------------------------------

# Floor calibrated to the synthetic corpus so it actually drops terms
# (its rare-word df is ~25, common words 370+); real corpora use 2-5.
_IDX_MIN_DF = 100
_POSTINGS_CAP = 16


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(words_expr("text"))).alias("word"))
    tf = toks.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # Postings serialize to a comma-joined string (numeric sort BEFORE the
    # string cast) — top-level array columns break external row hashers;
    # same convention as agg_collect_sorted_sets (relational4.py).
    # Bounded collect (r7): the cap is applied via row_number BEFORE the
    # per-term aggregation buffer fills — collect_list skips the WHEN's
    # NULLs, so a stopword's millions of postings never materialize in one
    # buffer; df/total_tf still aggregate the full posting stream. The
    # word-partition exchange the window needs is the same one the final
    # groupBy required anyway.
    rn = F.row_number().over(Window.partitionBy("word").orderBy("doc_id"))
    tf = tf.withColumn("rn", rn)
    postings = F.transform(
        F.sort_array(
            F.collect_list(F.when(F.col("rn") <= _POSTINGS_CAP, F.struct("rn", "doc_id")))
        ),
        lambda s: s["doc_id"].cast("string"),
    )
    return (
        tf.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(",", postings).alias("postings"),
        )
        .filter(F.col("df") >= _IDX_MIN_DF)
    )


INVERTED_INDEX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, w.word
  FROM documents, unnest({oracle_words_expr("text")}) AS w(word)),
tf AS (
  SELECT word, doc_id, COUNT(*) AS tf FROM toks GROUP BY word, doc_id)
SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string((list_sort(list(doc_id)))[1:{_POSTINGS_CAP}], ',') AS postings
FROM tf GROUP BY word HAVING COUNT(*) >= {_IDX_MIN_DF}
"""


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncapped posting rows (word, doc_id, tf): the full-index
    representation. One tokenize scan, one (word, doc_id) hash agg with
    map-side partials — no per-term row aggregation, so a stopword's
    postings never concentrate in one row."""
    docs = parallelize_scan(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(words_expr("text"))).alias("word"))
    return toks.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def write_inverted_index(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = 64
) -> None:
    """The UNCAPPED inverted-index scale path: write the full posting rows
    as term-clustered parquet (range-partitioned + sorted on `word` via
    write_clustered_parquet), so every output file carries a narrow
    disjoint term range in its footer and a term-lookup scan prunes to
    one file. Term stats (df, total_tf) are then derived from the written
    postings — a second pass over the compact index, not the raw text —
    and written term-clustered too. This is how the index stays writable
    at 100 TB: no row ever holds a full posting list (a stopword's list
    is corpus-sized), and readers get footer-stat pruning for free.
    """
    from lua_mapreduce_spark.sources import read_parquet, write_clustered_parquet

    postings = inverted_index_postings(spark, sf_dir)
    write_clustered_parquet(postings, f"{path}/postings", ["word"], n_files)
    stats = (
        read_parquet(spark, f"{path}/postings")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
    )
    write_clustered_parquet(
        stats, f"{path}/term_stats", ["word"], max(1, n_files // 8)
    )


# --------------------------------------------------------------------------
# FUZZY benchmark decontamination: MinHash-banded near-dup overlap between
# the corpus and the held-out benchmark slice — the scale path real
# pipelines run next to exact n-gram overlap (text_decontaminate above):
# paraphrased/reformatted eval contamination survives exact shingle match
# but not near-dup detection. Reuses the cached one-scan MinHash
# signatures (dedup.py); only (doc_id, band) rows shuffle for the
# cross-set bucket join, and the benchmark side is a small fraction of
# the corpus at any scale. Banding recall is probabilistic below ~0.9
# jaccard, so the oracle replays the SAME md5 banding in SQL — exactness
# over an approximate algorithm, not an approximate check.
# --------------------------------------------------------------------------

_FUZZY_BENCH_MOD = 31  # benchmark slice = every 31st doc (as text_decontaminate)


def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lua_mapreduce_spark.operators.dedup import (
        _BAND_ROWS,
        _JACCARD_THRESHOLD,
        _N_BANDS,
        _minhash_signatures,
    )

    mh = _minhash_signatures(spark, sf_dir)
    band_cols = [
        F.struct(
            F.lit(band).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{band * _BAND_ROWS + r}") for r in range(_BAND_ROWS)],
                )
            ).alias("band_hash"),
        )
        for band in range(_N_BANDS)
    ]
    banded = mh.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band_idx").alias("band_idx"),
             F.col("b.band_hash").alias("band_hash"))
    corpus_b = banded.filter(F.col("doc_id") % _FUZZY_BENCH_MOD != 0).alias("c")
    bench_b = banded.filter(F.col("doc_id") % _FUZZY_BENCH_MOD == 0).alias("q")
    candidates = (
        corpus_b.join(
            bench_b,
            (F.col("c.band_idx") == F.col("q.band_idx"))
            & (F.col("c.band_hash") == F.col("q.band_hash")),
        )
        .select(F.col("c.doc_id").alias("doc_id"), F.col("q.doc_id").alias("bench_id"))
        .distinct()
    )
    sc_ = mh.select(F.col("doc_id"), F.col("shingles").alias("sh_c"))
    sq = mh.select(F.col("doc_id").alias("bench_id"), F.col("shingles").alias("sh_q"))
    verified = (
        candidates.join(sc_, "doc_id")
        .join(sq, "bench_id")
        .select(
            "doc_id",
            "bench_id",
            (
                F.size(F.array_intersect("sh_c", "sh_q")).cast("double")
                / (
                    F.size("sh_c") + F.size("sh_q")
                    - F.size(F.array_intersect("sh_c", "sh_q"))
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )
    return verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


def _fuzzy_decon_oracle() -> str:
    from lua_mapreduce_spark.operators.dedup import (
        _BAND_ROWS,
        _JACCARD_THRESHOLD,
        _N_BANDS,
        _SHINGLES_ORACLE_CTE,
        _minhash_exprs,
    )

    base = oracle_md5_bigint_expr("shingle")
    mins = ",\n         ".join(
        f"MIN({e}) AS m{i}" for i, e in enumerate(_minhash_exprs(f"({base})"))
    )
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {band} AS band_idx, "
        f"md5(concat_ws(',', {', '.join(f'm{band * _BAND_ROWS + r}' for r in range(_BAND_ROWS))}))"
        f" AS band_hash FROM mh"
        for band in range(_N_BANDS)
    )
    return f"""
WITH {_SHINGLES_ORACLE_CTE},
mh AS (
  SELECT doc_id,
         {mins}
  FROM shingles GROUP BY doc_id),
banded AS (
{band_rows}
),
candidates AS (
  SELECT DISTINCT c.doc_id AS doc_id, q.doc_id AS bench_id
  FROM banded c JOIN banded q
    ON c.band_idx = q.band_idx AND c.band_hash = q.band_hash
  WHERE c.doc_id % {_FUZZY_BENCH_MOD} != 0 AND q.doc_id % {_FUZZY_BENCH_MOD} = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT cand.doc_id, cand.bench_id, COUNT(*) AS n_common
  FROM candidates cand
  JOIN shingles sc ON sc.doc_id = cand.doc_id
  JOIN shingles sq ON sq.doc_id = cand.bench_id AND sc.shingle = sq.shingle
  GROUP BY 1, 2),
verified AS (
  SELECT common.doc_id AS doc_id, common.bench_id AS bench_id,
         CAST(n_common AS DOUBLE) / CAST(sc.n + sq.n - n_common AS DOUBLE) AS jaccard
  FROM common
  JOIN sizes sc ON sc.doc_id = common.doc_id
  JOIN sizes sq ON sq.doc_id = common.bench_id
  WHERE CAST(n_common AS DOUBLE) / CAST(sc.n + sq.n - n_common AS DOUBLE)
        >= {_JACCARD_THRESHOLD})
SELECT doc_id, COUNT(*) AS n_bench_matches, MAX(jaccard) AS max_jaccard
FROM verified GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Deterministic global shuffle -> shard export: the final step between a
# curated corpus and tokenization. Training runs need the corpus in a
# uniformly-shuffled order that is REPRODUCIBLE (restart a failed export,
# get byte-identical shards) and partition-stable (adding an executor must
# not change the permutation) — rand() and TABLESAMPLE are neither. The
# md5 of the doc key is the permutation: uniform, seedless, stable.
#
# 100 TB shape: ONE hash shuffle (the shard exchange feeding the per-shard
# position window); the real exporter then writes
# repartition(shard).sortWithinPartitions(shuffle_key) parquet — one file
# per shard, already in shuffled order, no global sort. Shard count scales
# with corpus size (here 16; a 100 TB corpus uses ~100k shards so each
# stays executor-memory-sized); the plan shape is shard-count-independent.
# --------------------------------------------------------------------------

_EXPORT_SHARDS = 16


def curation_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.expr(md5_bigint_expr("CAST(doc_id AS STRING)")).alias("shuffle_key"),
    ).withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(_EXPORT_SHARDS)))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).alias("pos"),
        # Running byte budget per shard: the exporter's split points for
        # secondary chunking ride along for free in the same window.
        F.sum("n_chars").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum_chars"),
    )


SHUFFLE_SHARDS_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {oracle_md5_bigint_expr("CAST(doc_id AS VARCHAR)")} AS shuffle_key
  FROM documents)
SELECT doc_id, CAST(shuffle_key % {_EXPORT_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER w AS INT) AS pos,
       CAST(SUM(n_chars) OVER w AS BIGINT) AS cum_chars
FROM keyed
WINDOW w AS (PARTITION BY shuffle_key % {_EXPORT_SHARDS}
             ORDER BY shuffle_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = _EXPORT_SHARDS,
    key_col: str = "doc_id",
    mode: str = "overwrite",
) -> dict:
    """The real exporter behind ``curation_shuffle_shards``: write ``df``
    as ``n_shards`` deterministically-shuffled parquet shards.

    shard = md5(key) % n_shards; rows within a shard are laid out in
    shuffle-key order via repartition + sortWithinPartitions — NO global
    sort, and the plan is shard-count-independent (a 100 TB corpus just
    raises n_shards so each stays executor-memory-sized). partitionBy
    writes one ``shard=K/`` directory per shard, exactly one file each
    (each task holds whole shards after the repartition). Returns the
    manifest {shard: {"rows": n, "bytes": chars}} (``bytes`` falls back
    to the row count when the frame has no ``text`` column) — computed
    with one bounded n_shards-row aggregate, also written as ``_manifest.json``
    beside the shards so a loader can plan without listing files. The
    manifest goes through the same Hadoop FileSystem API as the parquet
    write, so hdfs:// / s3a:// output paths work end-to-end — not just the
    local filesystem.
    Reading any shard back in path order replays the exact sequence the
    ``curation_shuffle_shards`` query enumerates (same key, same order)."""
    import json as _json

    keyed = df.withColumn(
        "shuffle_key", F.expr(md5_bigint_expr(f"CAST({key_col} AS STRING)"))
    ).withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)))
    (
        # sort leads with shard: a task may hold several whole shards
        # (hash collisions on the shard value), and each must stay
        # contiguous and internally key-ordered.
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", key_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    shard_stats = keyed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr("CAST(SUM(length(CAST(text AS STRING))) AS BIGINT)").alias("bytes")
        if "text" in df.columns
        else F.count(F.lit(1)).alias("bytes"),
    )
    manifest_rows = shard_stats.collect()  # bounded: exactly n_shards rows
    manifest = {
        int(r.shard): {"rows": int(r.rows), "bytes": int(r.bytes)}
        for r in manifest_rows
    }
    spark = df.sparkSession
    jvm = spark._jvm
    manifest_path = jvm.org.apache.hadoop.fs.Path(path, "_manifest.json")
    fs = manifest_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(manifest_path, True)
    try:
        out.write(
            bytearray(
                _json.dumps(manifest, indent=1, sort_keys=True).encode("utf-8")
            )
        )
    finally:
        out.close()
    return manifest


def curation_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard-export sink's query face: run ``write_training_shards``
    on the documents table (real parquet write + manifest) and report per
    shard what actually landed — rows and text bytes aggregated from the
    WRITTEN files read back through ``read_training_shards``, so the full
    write -> layout -> read path is on the oracle gate, not just the plan.
    The oracle replays the md5 sharding arithmetic directly over the
    source table: equality proves the export is lossless and the shard
    assignment deterministic. Overwrite mode keeps the query idempotent;
    the export lands in a per-(application, sf) temp dir (the streaming
    harness convention)."""
    import os as _os
    import tempfile as _tempfile

    docs = load_table(spark, sf_dir, "documents")
    out = _os.path.join(
        _tempfile.gettempdir(),
        "lmrs_shard_export_"
        + spark.sparkContext.applicationId
        + "_"
        + _os.path.basename(_os.path.abspath(sf_dir)),
    )
    write_training_shards(docs, out)
    back = read_training_shards(spark, out)
    return back.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("CAST(SUM(length(text)) AS BIGINT)").alias("n_bytes"),
    )


SHARD_MANIFEST_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, text,
         {oracle_md5_bigint_expr("CAST(doc_id AS VARCHAR)")} AS k
  FROM documents)
SELECT CAST(k % {_EXPORT_SHARDS} AS BIGINT) AS shard,
       COUNT(*) AS n_rows,
       CAST(SUM(length(text)) AS BIGINT) AS n_bytes
FROM keyed GROUP BY 1
"""


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read back a ``write_training_shards`` export. With ``shards``, the
    filter on the shard partition column prunes to those directories at
    plan time (directory-level skip — no bytes of other shards are read;
    the standard way a multi-epoch trainer streams one shard subset per
    worker). Row order within a shard file is the deterministic
    shuffle-key order the exporter wrote."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


QUERIES = {
    "text_decontaminate": text_decontaminate,
    "text_repetition_filter": text_repetition_filter,
    "text_tfidf": text_tfidf,
    "curation_sample_mixture": curation_sample_mixture,
    "text_chunk_tokens": text_chunk_tokens,
    "text_boilerplate_ngrams": text_boilerplate_ngrams,
    "curation_pack_sequences": curation_pack_sequences,
    "text_inverted_index": text_inverted_index,
    "curation_shuffle_shards": curation_shuffle_shards,
    "curation_shard_manifest": curation_shard_manifest,
    "text_decontaminate_fuzzy": text_decontaminate_fuzzy,
}

ORACLES = {
    "text_decontaminate": DECONTAMINATE_ORACLE,
    "text_repetition_filter": REPETITION_ORACLE,
    "text_tfidf": TFIDF_ORACLE,
    "curation_sample_mixture": MIXTURE_ORACLE,
    "text_chunk_tokens": CHUNK_ORACLE,
    "text_boilerplate_ngrams": BOILERPLATE_ORACLE,
    "curation_pack_sequences": PACK_ORACLE,
    "text_inverted_index": INVERTED_INDEX_ORACLE,
    "curation_shuffle_shards": SHUFFLE_SHARDS_ORACLE,
    "curation_shard_manifest": SHARD_MANIFEST_ORACLE,
    "text_decontaminate_fuzzy": _fuzzy_decon_oracle(),
}

"""Round-10 operator wave: weighted reservoir sampling (Efraimidis-
Spirakis A-ES) and crawl-frontier URL dedup.

Both are LLM-training-pipeline staples the north-star brief calls for —
weighted corpus subsampling (quality-weighted mixture draws) and
per-domain frontier compaction (canonicalize-then-keep-latest over crawl
fetches) — expressed as single-pass / single-shuffle DataFrame plans with
full DuckDB value oracles.

Reference context: the reference engine has no sampling or dedup surface
at all (its one workload is word count, example/word-count-taskfile.lua);
these extend the engine the way SURVEY.md §2.4's north-star rows specify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.texthash import (
    md5_bigint_expr,
    oracle_md5_bigint_expr,
)

# --------------------------------------------------------------------------
# Weighted reservoir sample (Efraimidis-Spirakis A-ES, deterministic)
# --------------------------------------------------------------------------

_AES_K = 100  # sample size
_AES_TWO60 = 1 << 60  # md5 hash domain (texthash convention)


def curation_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sample WITHOUT replacement: Efraimidis-Spirakis
    algorithm A-ES (Inf. Process. Lett. 97(5), 2006) with a DETERMINISTIC
    uniform draw so the oracle replays it — u_i = (md5_60(key) + 0.5) /
    2^60, and the selection is the k rows minimizing the exponential race
    key e_i = -ln(u_i) / w_i (order-equivalent to the paper's max
    u_i^(1/w_i) form; +0.5 keeps u strictly inside (0,1) so ln is
    finite). Inclusion probability is proportional-to-size without
    replacement — the quality-weighted corpus subsample primitive.

    Scale shape: ONE scan; the k-row selection compiles to
    TakeOrderedAndProject (per-partition top-k heaps + driver merge of
    n_partitions*k rows), never a global sort and never a shuffle of the
    data. Output carries only integer columns (the double race key stays
    internal; cross-engine float equality is only ever needed for the
    ORDER, where adjacent-key gaps are ~1e-4 relative — 11 decimal
    orders above last-ulp libm divergence, re-verified empirically at
    sf0.01 and sf0.1 in tests/test_round10.py)."""
    h = md5_bigint_expr("concat('order-', CAST(o_orderkey AS STRING))")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").alias(
                "weight_cents"
            ),
            # Everything double-typed EXPLICITLY: a bare decimal literal
            # would make the division DECIMAL arithmetic, whose rounding
            # rules differ between engines; double division is IEEE on
            # both. 2^60 is exactly representable as a double.
            F.expr(
                f"-ln((CAST({h} AS DOUBLE) + 0.5d)"
                f" / CAST({_AES_TWO60} AS DOUBLE))"
                " / CAST(round(o_totalprice * 100.0) AS BIGINT)"
            ).alias("_e"),
        )
        .orderBy("_e")
        .limit(_AES_K)
        .drop("_e")
    )


WEIGHTED_SAMPLE_AES_ORACLE = f"""
SELECT o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100.0) AS BIGINT) AS weight_cents
FROM orders
ORDER BY -ln((CAST({oracle_md5_bigint_expr(
    "concat('order-', CAST(o_orderkey AS VARCHAR))")} AS DOUBLE) + 0.5)
             / CAST({_AES_TWO60} AS DOUBLE))
         / CAST(round(o_totalprice * 100.0) AS BIGINT)
LIMIT {_AES_K}
"""


# --------------------------------------------------------------------------
# Crawl-frontier dedup (canonicalize URL, keep latest fetch per page)
# --------------------------------------------------------------------------


def _raw_url_expr(engine: str) -> str:
    """Deterministic synthetic fetch log over documents: every doc_id is
    one fetch of a URL needing canonicalization — mixed host case, www.
    prefixes, tracking query strings, fragments, trailing slashes —
    derived purely from (doc_id, source) so both engines build the
    identical log (the cdc_apply_changelog convention: the op's INPUT is
    synthesized in-query, its SEMANTICS are what the gate checks).
    The page modulus (100) is chosen against the generator's source
    cycle (source = src{{doc_id %% 20}}; 100 is a multiple of 20) so
    every canonical page really is re-fetched ~|docs|/100 times at EVERY
    sf — ~5x at the smallest parity SF — keeping the keep-latest rule
    non-vacuous where the driver gate runs (the lesson of the r9 CDC
    insert-offset advice)."""
    del engine  # same SQL both sides; the oracle swaps STRING -> VARCHAR
    return (
        "concat('https://', "
        " CASE WHEN doc_id % 3 = 0 THEN 'WWW.' "
        "      WHEN doc_id % 3 = 1 THEN 'www.' ELSE '' END, "
        " CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END, "
        " '.example.com/page/', CAST(doc_id % 100 AS STRING), "
        " CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END, "
        " CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' "
        "      WHEN doc_id % 4 = 1 THEN '#section-2' ELSE '' END)"
    )


def _canon_expr(engine: str, url: str) -> str:
    """Canonicalization pipeline, identical SQL on both engines (only
    split_part/lower/replace/trim — no regex dialect to diverge on):
    strip fragment, strip query, lowercase, drop www., drop trailing /."""
    x = f"split_part({url}, '#', 1)"
    x = f"split_part({x}, '?', 1)"
    x = f"lower({x})"
    x = f"replace({x}, '://www.', '://')"
    x = f"trim(TRAILING '/' FROM {x})"
    return x


def dedup_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier compaction: canonicalize every fetched URL, keep
    the LATEST fetch per canonical page (max fetch sequence = the
    recrawl-wins rule), report per-domain frontier stats. This is the
    dedup step every web-scale corpus ingest runs before text
    extraction — URL-level, upstream of content-level dedup
    (dedup_exact / minhash handle that).

    Scale shape: canonicalization is pure map-side string work (no
    regex, no Python); keep-latest is ONE hash shuffle on the canonical
    URL with rn=1 compiling to WindowGroupLimit (per-key runs truncate
    map-side before the exchange); the per-domain rollup re-groups the
    already-deduped (small) frontier."""
    docs = load_table(spark, sf_dir, "documents")
    raw = _raw_url_expr("spark")
    canon = _canon_expr("spark", "raw_url")
    from pyspark.sql import Window

    fetches = docs.select(
        F.col("doc_id").alias("fetch_seq"),
        F.expr(raw).alias("raw_url"),
    ).select("fetch_seq", F.expr(canon).alias("canon_url"))
    w = Window.partitionBy("canon_url").orderBy(F.desc("fetch_seq"))
    kept = (
        fetches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy(
        F.expr("split_part(canon_url, '/', 3)").alias("domain")
    ).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.expr("CAST(SUM(fetch_seq) AS BIGINT)").alias("kept_checksum"),
        F.expr("CAST(MAX(fetch_seq) AS BIGINT)").alias("latest_fetch"),
        F.expr("CAST(MIN(length(canon_url)) AS BIGINT)").alias("min_url_len"),
        F.expr("CAST(MAX(length(canon_url)) AS BIGINT)").alias("max_url_len"),
    )


CRAWL_FRONTIER_ORACLE = f"""
WITH fetches AS (
  SELECT doc_id AS fetch_seq,
         {_canon_expr("oracle", _raw_url_expr("oracle").replace(
             "AS STRING", "AS VARCHAR"))} AS canon_url
  FROM documents),
kept AS (
  SELECT fetch_seq, canon_url FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY canon_url
                                 ORDER BY fetch_seq DESC) AS rn
    FROM fetches)
  WHERE rn = 1)
SELECT split_part(canon_url, '/', 3) AS domain,
       COUNT(*) AS n_pages,
       CAST(SUM(fetch_seq) AS BIGINT) AS kept_checksum,
       CAST(MAX(fetch_seq) AS BIGINT) AS latest_fetch,
       CAST(MIN(length(canon_url)) AS BIGINT) AS min_url_len,
       CAST(MAX(length(canon_url)) AS BIGINT) AS max_url_len
FROM kept GROUP BY 1
"""


QUERIES = {
    "curation_weighted_sample_aes": curation_weighted_sample_aes,
    "dedup_crawl_frontier": dedup_crawl_frontier,
}

ORACLES = {
    "curation_weighted_sample_aes": WEIGHTED_SAMPLE_AES_ORACLE,
    "dedup_crawl_frontier": CRAWL_FRONTIER_ORACLE,
}

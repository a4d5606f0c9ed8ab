"""Behavioral tests for the curation operators (curation.py).

Value-level parity vs DuckDB is covered by test_oracle_parity.py; these
tests pin the SEMANTICS the hash can't see: non-vacuous outputs (the
round-2 anti-join lesson — a green hash on an accidentally-empty result
proves nothing), selection invariants, and the scale-relevant plan shapes.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators.curation import (
    _BOILER_TOPK,
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _DECON_BENCH_MOD,
    _MIX_DEFAULT_RATE,
    _MIX_RATES,
    _TFIDF_TOPK,
    curation_sample_mixture,
    text_boilerplate_ngrams,
    text_chunk_tokens,
    text_decontaminate,
    text_repetition_filter,
    text_tfidf,
)
from tests.conftest import SF_MEDIUM, SF_SMALL


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_decontaminate_nonvacuous_and_disjoint(spark):
    rows = text_decontaminate(spark, SF_MEDIUM).collect()
    assert len(rows) > 0, "calibrated n-gram size should flag some docs"
    for r in rows:
        # Benchmark docs are never flagged as corpus contamination...
        assert r.doc_id % _DECON_BENCH_MOD != 0
        # ...and every reported witness IS a benchmark doc.
        assert r.first_bench_doc % _DECON_BENCH_MOD == 0
        assert r.n_shared_shingles >= 1


def test_repetition_filter_covers_corpus_and_flags_both_ways(spark):
    df = text_repetition_filter(spark, SF_MEDIUM)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet").count()
    assert len(rows) == n_docs, "every (>=2-token) doc gets a feature row"
    flags = {r.flagged for r in rows}
    assert flags == {True, False}, "thresholds should split the corpus, not rubber-stamp it"
    for r in rows:
        assert 0.0 <= r.dup_word_frac < 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0


def test_tfidf_topk_and_rarity_ordering(spark):
    df = text_tfidf(spark, SF_MEDIUM)
    rows = df.collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, terms in per_doc.items():
        assert 1 <= len(terms) <= _TFIDF_TOPK
        assert sorted(t.rnk for t in terms) == list(range(1, len(terms) + 1))
        ordered = sorted(terms, key=lambda t: t.rnk)
        for a, b in zip(ordered, ordered[1:]):
            assert a.tfidf >= b.tfidf
    # idf must do its job: a term every document contains (df == N) scores
    # exactly tf * 1.0, never above a same-tf rarer term.
    n_docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet").count()
    for r in rows:
        if r.df == n_docs:
            assert r.tfidf == float(r.tf)


def test_mixture_rates_and_weights(spark):
    df = curation_sample_mixture(spark, SF_MEDIUM)
    rows = df.collect()
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    per_source_total = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    kept: dict[str, int] = {}
    for r in rows:
        kept[r.source] = kept.get(r.source, 0) + 1
        rate = _MIX_RATES.get(r.source, _MIX_DEFAULT_RATE)
        assert r.weight == 1000.0 / rate
    # Full-keep source passes through completely; down-weighted sources
    # actually shrink (binomial noise can't make 10% look like 100%).
    assert kept["src0"] == per_source_total["src0"]
    for src, total in per_source_total.items():
        rate = _MIX_RATES.get(src, _MIX_DEFAULT_RATE)
        if rate <= 250:
            assert kept.get(src, 0) < total


def test_mixture_is_map_side_only(spark):
    """The sampling gate must evaluate inside the scan stage: no Exchange
    beyond parallelize_scan's small-input repartition, no aggregation —
    at 100 TB this operator is a pure pass-through filter."""
    plan = _explain(curation_sample_mixture(spark, SF_MEDIUM))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1
    assert "HashAggregate" not in plan and "Sort" not in plan


def test_chunking_covers_every_token_with_overlap(spark):
    """Reassembling chunks must reproduce each document's token stream:
    chunk c covers tokens [c*stride, c*stride + size); consecutive chunks
    overlap by size - stride tokens; no token is dropped."""
    from lua_mapreduce_spark.functions.texthash import words_expr

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    n_toks = {
        r.doc_id: r.n
        for r in docs.selectExpr(
            "doc_id", f"size({words_expr('text')}) AS n"
        ).collect()
    }
    per_doc: dict[int, list] = {}
    for r in text_chunk_tokens(spark, SF_MEDIUM).collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == {d for d, n in n_toks.items() if n >= 1}
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda c: c.chunk_id)
        total = n_toks[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        covered = 0
        for c in chunks:
            start = c.chunk_id * _CHUNK_STRIDE
            assert c.n_tokens == min(_CHUNK_SIZE, total - start)
            assert len(c.chunk_text.split(" ")) == c.n_tokens
            covered = max(covered, start + c.n_tokens)
        assert covered == total, "tail tokens dropped"


def test_chunking_is_map_side_only(spark):
    plan = _explain(text_chunk_tokens(spark, SF_MEDIUM))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1  # parallelize_scan only
    assert "HashAggregate" not in plan


def test_boilerplate_fraction_bounds_and_hits(spark):
    rows = text_boilerplate_ngrams(spark, SF_MEDIUM).collect()
    assert len(rows) > 0
    assert any(r.n_boiler > 0 for r in rows), "top-K trigrams never matched — vacuous"
    assert any(r.n_boiler == 0 for r in rows), "everything boilerplate — degenerate"
    for r in rows:
        assert 0.0 <= r.boiler_frac <= 1.0
    # The boilerplate set is bounded: distinct matched trigrams <= K.
    matched = text_boilerplate_ngrams(spark, SF_MEDIUM)
    assert matched.agg(F.sum("n_boiler")).collect()[0][0] <= _BOILER_TOPK * len(rows)


def test_decontaminate_two_scans_max(spark):
    """One scan per join side and no more (in production the benchmark
    side is a separate tiny table, so the corpus text is scanned exactly
    once; here both sides derive from `documents`, giving two scans). The
    doc_id%mod split must reach both scans as a pushed filter so each side
    reads only its slice."""
    plan = _explain(text_decontaminate(spark, SF_MEDIUM))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2


def test_pack_sequences_offsets_are_contiguous_per_shard(spark):
    """Within each shard, documents tile the token stream with no gaps or
    overlaps (start_off = running sum of prior docs' n_tokens in doc_id
    order), and seq placement arithmetic is consistent with the budget."""
    from lua_mapreduce_spark.operators.curation import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        curation_pack_sequences,
    )

    rows = curation_pack_sequences(spark, SF_MEDIUM).collect()
    assert len(rows) > 0
    shards: dict[int, list] = {}
    for r in rows:
        assert r.shard == r.doc_id % _PACK_SHARDS
        shards.setdefault(r.shard, []).append(r)
    assert set(shards) == set(range(_PACK_SHARDS))
    straddles = 0
    for docs in shards.values():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            assert r.start_off == off, "gap/overlap in the packed stream"
            off += r.n_tokens
            assert r.seq_id == r.start_off // _PACK_BUDGET
            last = (r.start_off + r.n_tokens - 1) // _PACK_BUDGET
            assert r.n_seqs == last - r.seq_id + 1 >= 1
            straddles += r.n_seqs > 1
    assert straddles > 0, "budget never straddled — packing is vacuous"


def test_pack_sequences_single_shuffle(spark):
    """One exchange total: the shard repartition that feeds the window."""
    from lua_mapreduce_spark.operators.curation import curation_pack_sequences

    plan = _explain(curation_pack_sequences(spark, SF_MEDIUM))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan


def test_inverted_index_postings_sorted_capped_nonvacuous(spark):
    from lua_mapreduce_spark.operators.curation import (
        _IDX_MIN_DF,
        _POSTINGS_CAP,
        text_inverted_index,
    )

    rows = text_inverted_index(spark, SF_MEDIUM).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.df >= _IDX_MIN_DF
        # Postings are a comma-joined string (driver-hashable); elements
        # must be numerically sorted and capped.
        posting_ids = [int(p) for p in r.postings.split(",")]
        assert posting_ids == sorted(posting_ids)
        assert len(posting_ids) == min(r.df, _POSTINGS_CAP)
        assert r.total_tf >= r.df
    # The floor must actually drop something: full vocab > indexed vocab.
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    from lua_mapreduce_spark.functions.texthash import words_expr

    vocab = (
        docs.selectExpr(f"explode({words_expr('text')}) AS w").distinct().count()
    )
    assert vocab > len(rows), "min-df floor filtered nothing — vacuous"


def test_shuffle_shards_single_shuffle_plan(spark):
    """One Exchange total: the shard hash partition feeding the position
    window. The md5 permutation key is computed map-side in the scan
    projection."""
    from lua_mapreduce_spark.operators.curation import curation_shuffle_shards

    plan = _explain(curation_shuffle_shards(spark, SF_MEDIUM))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan


def test_shuffle_shards_reproducible_uniform_contiguous(spark):
    """The export permutation is deterministic across runs (no RNG state),
    shard sizes are near-uniform (hash balance), and positions are a
    contiguous 1..n per shard (a resumable exporter can seek by pos)."""
    from lua_mapreduce_spark.operators.curation import (
        _EXPORT_SHARDS,
        curation_shuffle_shards,
    )

    rows = curation_shuffle_shards(spark, SF_MEDIUM).collect()
    again = curation_shuffle_shards(spark, SF_MEDIUM).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(_EXPORT_SHARDS))
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] <= 2 * sizes[0], f"shard skew: {sizes}"
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_fuzzy_decontaminate_nonvacuous_and_disjoint_from_bench(spark):
    """Flagged docs exist at sf0.01, are corpus-side only (never benchmark
    members), and every flag carries a verified jaccard >= threshold."""
    from lua_mapreduce_spark.operators.curation import (
        _FUZZY_BENCH_MOD,
        text_decontaminate_fuzzy,
    )
    from lua_mapreduce_spark.operators.dedup import _JACCARD_THRESHOLD

    rows = text_decontaminate_fuzzy(spark, SF_MEDIUM).collect()
    assert rows, "no fuzzy contamination found — check banding/threshold"
    for r in rows:
        assert r.doc_id % _FUZZY_BENCH_MOD != 0
        assert r.n_bench_matches >= 1
        assert r.max_jaccard >= _JACCARD_THRESHOLD


def test_write_inverted_index_uncapped_clustered(spark, tmp_path):
    """write_inverted_index writes term-clustered postings whose per-file
    word ranges tile (footer-stat pruning works), plus term stats that
    must agree with the capped registry query's df/total_tf on every
    term that query keeps."""
    import glob

    import pyarrow.parquet as pq

    from lua_mapreduce_spark.operators.curation import (
        text_inverted_index,
        write_inverted_index,
    )

    out = str(tmp_path / "index")
    n_files = 8
    write_inverted_index(spark, SF_SMALL, out, n_files=n_files)

    ranges = []
    for f in sorted(glob.glob(f"{out}/postings/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("word")
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        if stats:
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    assert len(ranges) > 1
    ranges.sort()
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi <= lo2, f"postings file term ranges overlap: {ranges}"

    # Stats derived from the uncapped postings must match the capped
    # query's aggregates for every term above the df floor.
    stats_df = spark.read.parquet(f"{out}/term_stats")
    capped = {
        r.word: (r.df, r.total_tf)
        for r in text_inverted_index(spark, SF_SMALL).collect()
    }
    got = {r.word: (r.df, r.total_tf) for r in stats_df.collect()}
    assert capped, "df floor left nothing to compare at sf0.001"
    for w, expect in capped.items():
        assert got[w] == expect, f"{w}: {got[w]} != {expect}"
    # And the uncapped index keeps the sub-floor tail the capped one drops.
    assert len(got) > len(capped)


def test_collocations_rank_by_association_not_frequency(spark):
    """Lift ordering is PMI ordering: the returned list is sorted by lift
    with the deterministic tie-break, every pair clears the count floor,
    and the top collocation is genuinely associated (lift > 1 = the pair
    co-occurs more than independence predicts)."""
    from lua_mapreduce_spark.operators import QUERIES
    from lua_mapreduce_spark.operators.text import _COLL_K, _COLL_MIN

    rows = QUERIES["text_collocations"](spark, SF_MEDIUM).collect()
    assert 0 < len(rows) <= _COLL_K
    assert all(r.c_bigram >= _COLL_MIN for r in rows)
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert rows[0].lift > 1.0


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """The shard exporter writes one file per shard=K dir, rows land in
    their md5-assigned shard in shuffle-key order, totals are preserved,
    and the manifest matches the files."""
    import glob
    import json

    from pyspark.sql import functions as F

    from lua_mapreduce_spark.functions.texthash import md5_bigint_expr
    from lua_mapreduce_spark.operators.curation import (
        _EXPORT_SHARDS,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out)

    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(dirs) == _EXPORT_SHARDS
    for d in dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1, f"multiple files in {d}"

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # every row sits in its md5-assigned shard
    misplaced = back.filter(
        F.pmod(
            F.expr(md5_bigint_expr("CAST(doc_id AS STRING)")),
            F.lit(_EXPORT_SHARDS),
        )
        != F.col("shard")
    ).count()
    assert misplaced == 0
    # within a shard file, rows are in shuffle-key order (read preserves
    # single-file row order)
    one = spark.read.parquet(dirs[0]).select("shuffle_key").collect()
    keys = [r.shuffle_key for r in one]
    assert keys == sorted(keys)
    # manifest agrees with the data and the written json
    assert sum(m["rows"] for m in manifest.values()) == docs.count()
    on_disk = json.load(open(f"{out}/_manifest.json"))
    assert {int(k): v for k, v in on_disk.items()} == manifest


def test_read_training_shards_prunes_directories(spark, tmp_path):
    """Selecting shards applies a PartitionFilter on the shard column —
    unselected shard directories are skipped at plan time — and the rows
    read equal exactly the manifest's selected-shard populations."""
    import io
    import re
    from contextlib import redirect_stdout

    from lua_mapreduce_spark.operators.curation import (
        read_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out)

    picked = [0, 3, 7]
    df = read_training_shards(spark, out, shards=picked)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "shard" in m.group(1), "shard filter did not reach the scan"
    assert df.count() == sum(manifest[s]["rows"] for s in picked)
    assert {r.shard for r in df.select("shard").distinct().collect()} == set(picked)
    # no-filter read returns everything
    assert read_training_shards(spark, out).count() == docs.count()

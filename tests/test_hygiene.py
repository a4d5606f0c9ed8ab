"""Tests for hygiene.py: substring dedup, SemDeDup, PII scrub.

Value-level correctness vs DuckDB is covered by the oracle parity suite
(all three queries carry full oracles); these tests assert the operator
SEMANTICS on synthetic inputs where the expected answer is computable by
hand, plus the scale mechanics (map-side-only PII plan, SemDeDup removals
consistent with exact global near-dup pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators.hygiene import (
    _SEM_COS_THRESHOLD,
    _SUB_N,
    curation_pii_scrub,
    dedup_semantic_semdedup,
    scrub_pii,
    substring_dup_stats,
)
from tests.conftest import SF_MEDIUM


def _toks(prefix: str, n: int) -> list[str]:
    """n DISTINCT purely-alphabetic tokens (the tokenizer drops digits)."""
    return [f"{prefix}{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(n)]


def test_substring_identical_docs_fully_flagged(spark):
    """Two identical long docs -> every window duplicated (permille 1000);
    an unrelated doc -> zero duplicated windows; a doc shorter than the
    window width is excluded by contract."""
    long_text = " ".join(_toks("tok", 30))
    other = " ".join(_toks("uniq", 30))
    docs = spark.createDataFrame(
        [
            (1, long_text),
            (2, long_text),
            (3, other),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in substring_dup_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}
    n_windows = 30 - _SUB_N + 1
    for d in (1, 2):
        assert rows[d].n_windows == n_windows
        assert rows[d].n_dup_windows == n_windows
        assert rows[d].dup_permille == 1000 and rows[d].is_dup
    assert rows[3].n_dup_windows == 0 and not rows[3].is_dup


def test_substring_partial_overlap_fraction(spark):
    """A doc sharing exactly its first half with another doc gets the
    expected duplicated-window count (windows fully inside the shared
    prefix), not all-or-nothing."""
    shared = _toks("s", 16)
    a = shared + _toks("aa", 16)
    b = shared + _toks("bb", 16)
    docs = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in substring_dup_stats(docs).collect()}
    # Windows starting at 0..16-_SUB_N lie fully inside the shared prefix.
    expect_dup = 16 - _SUB_N + 1
    for d in (1, 2):
        assert rows[d].n_windows == 32 - _SUB_N + 1
        assert rows[d].n_dup_windows == expect_dup


def test_pii_scrub_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact john.doe+x@mail.example.org or 10.0.0.1 now"),
            (2, "acct 12345678 customer and supplier part data"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert rows[1].n_email == 1 and rows[1].n_ipv4 == 1 and rows[1].n_longnum == 0
    assert rows[1].masked_text == "contact [EMAIL] or [IP] now"
    assert rows[2].n_longnum == 1 and rows[2].n_terms == 3
    assert rows[2].masked_text == "acct [NUM] [ENT] and [ENT] [ENT] data"
    assert rows[3].masked_text == "clean text only"
    assert all(
        getattr(rows[3], c) == 0
        for c in ("n_email", "n_ipv4", "n_longnum", "n_terms")
    )


def test_substring_plan_tokenizes_once(spark):
    """The regexp tokenizer must appear at most 4 times in the optimized
    plan: (pushed size() filter + window projection) x the two uses of
    the grams relation (frequency agg + join-back). An intermediate
    projection between the window expression and explode() lets
    CollapseProject inline the token array into every l[...] subscript —
    ~20 tokenizer copies, measured 15x slower at sf0.1."""
    from lua_mapreduce_spark.operators.hygiene import dedup_substring_windows

    plan = (
        dedup_substring_windows(spark, SF_MEDIUM)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("regexp_extract_all") <= 4, (
        f"tokenizer inlined {plan.count('regexp_extract_all')} times"
    )


def test_pii_scrub_is_map_side_only(spark):
    """The scrub touches each row once: no Exchange anywhere in the plan."""
    from lua_mapreduce_spark.catalog import load_table

    # load_table directly: parallelize_scan's small-input repartition (a
    # no-op at real scale) would add the only Exchange.
    plan = (
        scrub_pii(load_table(spark, SF_MEDIUM, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_unigram_rarity_hand_computed(spark):
    """Tiny corpus with hand-computable stats: aa x3, bb x1, cc x1, N=5.
    Rarity contribution is N DIV cnt: aa -> 1, bb/cc -> 5."""
    from lua_mapreduce_spark.operators.hygiene import unigram_rarity_stats

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa cc")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_rarity_stats(docs).collect()}
    assert rows[1].n_tokens == 3
    assert rows[1].rarity_sum == 2 * 1 + 5
    assert rows[1].rarity_max == 5
    assert rows[1].n_rare == 0  # no word is below 1 permille here
    assert rows[2].n_tokens == 2
    assert rows[2].rarity_sum == 1 + 5


def test_semdedup_verdict_covers_corpus_and_finds_dups(spark):
    from lua_mapreduce_spark.catalog import load_table

    verdict = dedup_semantic_semdedup(spark, SF_MEDIUM)
    rows = verdict.collect()
    n_corpus = load_table(spark, SF_MEDIUM, "embeddings").count()
    assert len(rows) == n_corpus
    assert len({r.vec_id for r in rows}) == n_corpus
    removed = {r.vec_id for r in rows if not r.kept}
    assert removed, "threshold should remove at least one near-dup at sf0.01"


def test_semdedup_removals_are_true_near_dups(spark):
    """Clustering only PRUNES the pair space — it must not invent pairs:
    every removed vector has a lower-id partner with cosine >= threshold
    in the EXACT all-pairs graph (recomputed independently here)."""
    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.operators.similarity import _COS

    emb = load_table(spark, SF_MEDIUM, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    global_dups = {
        r.vec_id
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.expr(_COS) >= _SEM_COS_THRESHOLD)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .collect()
    }
    removed = {
        r.vec_id
        for r in dedup_semantic_semdedup(spark, SF_MEDIUM).collect()
        if not r.kept
    }
    assert removed <= global_dups
    # Recall: the within-cluster restriction should still catch a decent
    # share of the true near-dup set on this corpus.
    assert len(removed) >= 0.3 * max(len(global_dups), 1), (
        len(removed),
        len(global_dups),
    )


def test_cluster_balanced_sample_caps_every_cell(spark):
    """Full-corpus verdict; per cell exactly min(cell size, cap) sampled;
    ranks are a dense 1..cell_size permutation; deterministic re-run."""
    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.operators.hygiene import (
        _CB_KEEP_PER_CELL,
        curation_cluster_balanced_sample,
    )

    rows = curation_cluster_balanced_sample(spark, SF_MEDIUM).collect()
    n_corpus = load_table(spark, SF_MEDIUM, "embeddings").count()
    assert len(rows) == n_corpus
    assert len({r.vec_id for r in rows}) == n_corpus
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cent_id, []).append(r)
    assert len(by_cell) > 1, "degenerate clustering: everything in one cell"
    for cell, members in by_cell.items():
        ranks = sorted(m.cell_rank for m in members)
        assert ranks == list(range(1, len(members) + 1)), cell
        sampled = [m for m in members if m.sampled]
        assert len(sampled) == min(len(members), _CB_KEEP_PER_CELL), cell
        assert all(m.cell_rank <= _CB_KEEP_PER_CELL for m in sampled)
    again = {
        (r.vec_id, r.cell_rank, r.sampled)
        for r in curation_cluster_balanced_sample(spark, SF_MEDIUM).collect()
    }
    assert again == {(r.vec_id, r.cell_rank, r.sampled) for r in rows}

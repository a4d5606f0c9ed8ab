"""Round-14 tests: the chunk-order-proof retention fold (r13 ADVICE
medium — re-anchoring when a later Arrow chunk holds an earlier week),
overflow surfacing beyond the 62-bit mask (r13 ADVICE low), and the
novelty query's single-text-pass plan (r13 perf-weak fix)."""

from __future__ import annotations

import itertools
import random

from lua_mapreduce_spark.streaming.stateful import (
    _RET_FULL_MASK,
    _RET_MAX_OFF,
    _ret_update_weeks,
)
from tests.conftest import SF_MEDIUM, SF_SMALL


# --------------------------------------------------------------------------
# _ret_update_weeks: the retention fold must be chunk-order-invariant
# --------------------------------------------------------------------------


def _fold(batches: list[list[int]]) -> tuple[int, int, int]:
    first, mask, over = -1, 0, 0
    for b in batches:
        first, mask, over = _ret_update_weeks(first, mask, over, set(b))
    return first, mask, over


def _batch_truth(weeks: list[int]) -> tuple[int, int]:
    """Order-free MIN + bit-OR replay (the batch RETENTION_ORACLE
    reading) over in-range offsets."""
    first = min(weeks)
    mask = 0
    for w in weeks:
        off = w - first
        if off <= _RET_MAX_OFF:
            mask |= 1 << off
    return first, mask


def test_retention_fold_reanchors_on_early_late_chunk():
    """A later batch (or chunk) holding an EARLIER week must re-anchor:
    existing offset bits shift left by the delta instead of the early
    week's activity being dropped (r13 ADVICE medium)."""
    # anchor at week 100 first, then week 97 arrives late
    first, mask, over = _fold([[100, 101], [97]])
    assert (first, mask) == _batch_truth([100, 101, 97])
    assert first == 97
    assert mask == (1 << 0) | (1 << 3) | (1 << 4)
    assert over == 0


def test_retention_fold_is_order_invariant():
    """Every permutation of batch delivery, and every 2-way chunk split
    within a delivery, must fold to the identical (first, mask) as the
    order-free batch replay."""
    weeks = [50, 53, 50, 61, 55, 49, 70]
    want = _batch_truth(weeks)
    for perm in itertools.permutations(set(weeks)):
        assert _fold([[w] for w in perm])[:2] == want, perm
    rng = random.Random(14)
    for _ in range(50):
        shuffled = weeks[:]
        rng.shuffle(shuffled)
        cut = rng.randrange(1, len(shuffled))
        got = _fold([shuffled[:cut], shuffled[cut:]])
        assert got[:2] == want, shuffled
        assert got[2] == 0


def test_retention_fold_counts_overflow():
    """Offsets beyond _RET_MAX_OFF are COUNTED, not silently dropped:
    both a directly-out-of-range week and in-range bits later PUSHED
    out by a re-anchor must increment the counter (r13 ADVICE low)."""
    # direct overflow: week 200 is 100 offsets past anchor 100
    _, mask, over = _fold([[100], [200]])
    assert over == 1 and mask == 1
    # push-out overflow: bit 62 is in range until week 90 re-anchors
    # by 10, shifting it to 72 (> 62) — one bit lost, counted
    first, mask, over = _fold([[100, 100 + _RET_MAX_OFF], [90]])
    assert first == 90
    assert over == 1
    assert mask == (1 << 10) | (1 << 0)
    assert mask & ~_RET_FULL_MASK == 0


def test_retention_fold_empty_batch_is_noop():
    assert _ret_update_weeks(-1, 0, 0, set()) == (-1, 0, 0)
    assert _ret_update_weeks(5, 3, 1, set()) == (5, 3, 1)


# --------------------------------------------------------------------------
# streaming retention end-to-end still equals batch after the refactor,
# and the sink surfaces zero overflow on the fixture corpora
# --------------------------------------------------------------------------


def test_streaming_retention_sink_overflow_zero(spark):
    """The drained sink must expose the n_overflow column and report 0
    on the fixtures (~4-week span), proving the surfacing path exists
    without firing."""
    from lua_mapreduce_spark.operators.streaming_ops import (
        STREAM_STATE_PARTITIONS,
        _events_stream,
    )
    from lua_mapreduce_spark.streaming.stateful import (
        drain_stream,
        stream_retention_stateful,
    )

    sink = drain_stream(
        stream_retention_stateful(_events_stream(spark, SF_SMALL)),
        "r14_retention_overflow",
        output_mode="update",
        state_partitions=STREAM_STATE_PARTITIONS,
    )
    assert "n_overflow" in sink.columns
    assert sink.filter("n_overflow != 0").count() == 0


# --------------------------------------------------------------------------
# text_ngram_novelty: single text pass (shares the persisted signatures)
# --------------------------------------------------------------------------


def test_novelty_single_text_scan(spark):
    """After the r13-ADVICE fix the novelty query reads the documents
    table through the persisted signature relation on BOTH its
    references (the firsts aggregate side and the join-back side) —
    the executed plan shows >= 2 InMemoryTableScans (the
    test_minhash_single_text_pass convention: raw parquet scans appear
    only inside the cached relation's printed population plan), and
    parity with a pure-Python replay still holds at sf0.001."""
    import io
    import re as _re
    from contextlib import redirect_stdout

    from lua_mapreduce_spark.operators import analytics12 as a12
    from lua_mapreduce_spark.operators.dedup import clear_signature_cache

    clear_signature_cache()
    df = a12.text_ngram_novelty(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("InMemoryTableScan") >= 2, plan
    # value replay (independent of Spark AND DuckDB)
    import duckdb

    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    )
    sh = {}
    for d, t in docs.items():
        toks = [w.lower() for w in _re.findall(r"[A-Za-z]+", t)]
        if len(toks) >= 3:
            sh[d] = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    firsts: dict[str, int] = {}
    for d in sorted(sh):
        for s in sh[d]:
            if s not in firsts or d < firsts[s]:
                firsts[s] = d
    want = {
        d: (
            len(ss),
            sum(1 for s in ss if firsts[s] == d),
        )
        for d, ss in sh.items()
    }
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in df.collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# text_zipf_fit: the distributed-rank scale path (r13 verdict item 6)
# --------------------------------------------------------------------------


def test_zipf_rank_window_is_partitioned(spark):
    """The per-word row_number must be PARTITIONED by (cnt, pfx) — its
    windowspecdefinition lists the partition columns bare (no
    direction) — and the vocab-sized relation must never cross an
    Exchange SinglePartition (only the tiny bucket-offset rollup may).
    Values must still equal the oracle's global ROW_NUMBER (parity is
    the oracle gate; here a cheap invariant: bucket ranks are dense
    1..vocab)."""
    import io
    import re as _re
    from contextlib import redirect_stdout

    from lua_mapreduce_spark.operators import analytics10 as a10

    df = a10.text_zipf_fit(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    specs = _re.findall(r"windowspecdefinition\([^)]*\)", plan)
    rn_specs = [s for s in specs if "w#" in s and "ASC" in s]
    assert rn_specs, plan
    # partition columns print bare (no DESC/ASC) before the sort spec
    assert any(_re.match(r"windowspecdefinition\(cnt#\d+L?, pfx#\d+,", s) for s in rn_specs), rn_specs
    rows = {r["bucket"]: r for r in df.collect()}
    ranks = sorted((r["min_rank"], r["max_rank"]) for r in rows.values())
    # doubling buckets tile 1..vocab densely: each min = previous max + 1
    assert ranks[0][0] == 1
    for (lo1, hi1), (lo2, _hi2) in zip(ranks, ranks[1:]):
        assert lo2 == hi1 + 1, ranks

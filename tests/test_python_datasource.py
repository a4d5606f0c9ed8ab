"""Spark-4 Python DataSource (sources/python_datasource.py): partition
planning, plan-time page pruning via pushFilters, and row-level
correctness vs a pure-Python replay. Oracle parity for the query face is
in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators import QUERIES
from lua_mapreduce_spark.sources.python_datasource import (
    PagedRowsReader,
    register_paged_rows,
    row_hash,
)
from tests.conftest import SF_SMALL


class _Opts(dict):
    pass


def test_partition_planning_metadata_only():
    """ceil(n/page) partitions, each covering exactly its page; the last
    page is partial."""
    r = PagedRowsReader(_Opts(n_rows="100", page_size="30"))
    parts = r.partitions()
    assert [(p.page, p.start, p.end) for p in parts] == [
        (0, 0, 30),
        (1, 30, 60),
        (2, 60, 90),
        (3, 90, 100),
    ]


def test_pushed_bounds_prune_pages_but_stay_residual():
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThan,
    )

    r = PagedRowsReader(_Opts(n_rows="100", page_size="30"))
    filters = [
        GreaterThanOrEqual(("row_id",), 35),
        LessThan(("row_id",), 65),
    ]
    residual = list(r.pushFilters(filters))
    assert residual == filters  # ALL filters remain Spark's to re-check
    parts = r.partitions()
    # pages 0 and 3 are wholly out of range -> never planned; edge pages
    # are clipped to the pushed bounds
    assert [(p.page, p.start, p.end) for p in parts] == [(1, 35, 60), (2, 60, 65)]


def test_empty_range_plans_single_noop_task():
    from pyspark.sql.datasource import GreaterThan, LessThan

    r = PagedRowsReader(_Opts(n_rows="100", page_size="30"))
    r.pushFilters([GreaterThan(("row_id",), 80), LessThan(("row_id",), 10)])
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(0, 0)]


def test_full_read_matches_python_replay(spark):
    register_paged_rows(spark)
    df = (
        spark.read.format("lmrs_paged_rows")
        .option("n_rows", 100)
        .option("page_size", 30)
        .load()
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        (i // 30, i, f"row-{i}", row_hash(i)) for i in range(100)
    )
    assert got == want


def test_plan_time_page_pruning_reaches_spark(spark):
    """The face's row_id range covers pages 2..7 of 8 — the scan must
    plan exactly 6 tasks (pages 0-1 pruned before execution), and the
    residual predicate must clip the partial edge pages exactly."""
    from lua_mapreduce_spark.operators.sources_ops import (
        _PDS_HI,
        _PDS_LO,
        _PDS_N_ROWS,
        _PDS_PAGE,
    )

    register_paged_rows(spark)
    base = (
        spark.read.format("lmrs_paged_rows")
        .option("n_rows", _PDS_N_ROWS)
        .option("page_size", _PDS_PAGE)
        .load()
    )
    assert base.rdd.getNumPartitions() == _PDS_N_ROWS // _PDS_PAGE  # 8
    pruned = base.filter(
        (F.col("row_id") >= _PDS_LO) & (F.col("row_id") <= _PDS_HI)
    )
    assert pruned.rdd.getNumPartitions() == 6
    frontier = pruned.agg(
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (frontier.lo, frontier.hi, frontier.n) == (
        _PDS_LO,
        _PDS_HI,
        _PDS_HI - _PDS_LO + 1,
    )


def test_query_face_runs_and_is_sf_independent(spark):
    rows1 = sorted(
        map(tuple, QUERIES["source_python_datasource"](spark, SF_SMALL).collect())
    )
    assert len(rows1) == 6 and all(r[1] > 0 for r in rows1)


# ------------------------------------------------- streaming face


def test_stream_reader_offset_protocol():
    """read(start) is a pure function of the offset: pages advance one at
    a time, quiesce at the end, and readBetweenOffsets replays any
    committed range bit-identically."""
    from lua_mapreduce_spark.sources.python_datasource import (
        PagedRowsStreamReader,
    )

    r = PagedRowsStreamReader(_Opts(n_rows="25", page_size="10"))
    off = r.initialOffset()
    seen = []
    for want_hi in (10, 20, 25, 25, 25):  # two extra rounds: quiescent
        rows, off = r.read(off)
        seen.extend(rows)
        assert off == {"row": want_hi}
    assert [t[1] for t in seen] == list(range(25))
    # replay equality (the checkpoint-recovery contract)
    replay = list(r.readBetweenOffsets({"row": 10}, {"row": 20}))
    assert replay == seen[10:20]
    # iterators must be copyable (Spark's prefetch cache copy.copy()s them)
    import copy

    rows, _ = r.read({"row": 0})
    copy.copy(rows)


def test_streaming_face_drains_exactly_once(spark):
    """The restart-driven drain commits every page exactly once — total
    rows, page count, and id frontier all exact."""
    from lua_mapreduce_spark.operators.sources_ops import (
        _PDS_S_N_ROWS,
        _PDS_S_PAGE,
    )

    rows = sorted(
        map(
            tuple,
            QUERIES["streaming_python_datasource"](spark, SF_SMALL).collect(),
        )
    )
    n_pages = -(-_PDS_S_N_ROWS // _PDS_S_PAGE)
    assert len(rows) == n_pages
    assert sum(r[1] for r in rows) == _PDS_S_N_ROWS
    for p, n, first, last, _ck in rows:
        assert first == p * _PDS_S_PAGE
        assert last == min((p + 1) * _PDS_S_PAGE, _PDS_S_N_ROWS) - 1
        assert n == last - first + 1

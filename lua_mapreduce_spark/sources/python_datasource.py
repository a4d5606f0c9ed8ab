"""Spark 4 Python DataSource: a deterministic paged-rows source.

This is the modern PySpark analogue of the reference's ``taskfn`` source
slot — a USER-SUPPLIED generator that enumerates a data source and yields
(key, payload) pairs, which the framework then parallelizes
(word-count-taskfile.lua:82-88; the docstring's "could be data from the
disk or streaming"). The reference hands each yielded pair to one worker;
the Python DataSource API does the same thing properly: ``partitions()``
plans the task list ON THE DRIVER, and ``read(partition)`` runs ON THE
EXECUTORS, one task per partition, with results crossing to the JVM as
Arrow batches.

The source simulates the common "paged external API / keyed range scan"
shape: ``n_rows`` logical rows split into fixed-size pages, each page one
input partition. Every row is deterministic — ``row_key = 'row-<i>'`` and
``row_hash = first 15 hex digits of md5(row_key)`` (the repo's portable
60-bit hash convention, functions/texthash.py) — so a DuckDB oracle can
replay the whole source from ``range()`` + ``md5()`` and the external
correctness gate applies to a source with no backing file at all.

Scale design:

- **Partition planning is metadata-only**: the driver materializes one
  small ``InputPartition`` per page, never any row data. 100 TB of pages
  is still only O(pages) planning state.
- **Filter pushdown prunes pages**: ``pushFilters`` captures row_id
  bounds and ``partitions()`` plans only the overlapping pages — the
  Python-source equivalent of partition pruning. All filters are kept as
  residuals (returned unchanged), so correctness never depends on the
  pruning arithmetic; Spark re-applies them post-scan.
- **Arrow batches, not per-row pickling**: ``read`` yields one pyarrow
  RecordBatch per page, the vectorized fast path across the
  Python-to-JVM boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

PAGED_ROWS_SCHEMA = "page BIGINT, row_id BIGINT, row_key STRING, row_hash BIGINT"


def row_hash(i: int) -> int:
    """The portable 60-bit md5 hash of 'row-<i>' (texthash.py convention:
    first 15 hex digits parsed as an integer — replayed verbatim by
    DuckDB's ``('0x' || substr(md5(...), 1, 15))::BIGINT``)."""
    return int(hashlib.md5(f"row-{i}".encode()).hexdigest()[:15], 16)


class PagedRowsPartition(InputPartition):
    def __init__(self, page: int, start: int, end: int):
        self.page = page
        self.start = start  # inclusive row_id
        self.end = end  # exclusive row_id


class PagedRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.page_size = int(options.get("page_size", 1_250))
        if self.n_rows < 0 or self.page_size <= 0:
            raise ValueError("n_rows must be >= 0 and page_size > 0")
        # row_id bounds refined by pushFilters: [lo, hi) half-open.
        self.lo = 0
        self.hi = self.n_rows

    # -- filter pushdown (page pruning) ---------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Tighten [lo, hi) from AND-ed row_id comparisons, then return
        EVERY filter as a residual: pruning is a performance contract
        only, Spark still applies the exact predicates post-scan."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr != ("row_id",):
                continue
            if isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
        return filters

    # -- planning (driver-side, metadata only) --------------------------
    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = max(self.lo, 0), min(self.hi, self.n_rows)
        if lo >= hi:
            return [PagedRowsPartition(0, 0, 0)]  # empty scan, one no-op task
        first_page = lo // self.page_size
        last_page = (hi - 1) // self.page_size
        return [
            PagedRowsPartition(
                p,
                max(lo, p * self.page_size),
                min(hi, (p + 1) * self.page_size),
            )
            for p in range(first_page, last_page + 1)
        ]

    # -- execution (executor-side, Arrow batch per page) ----------------
    def read(self, partition: PagedRowsPartition):
        import pyarrow as pa

        ids = list(range(partition.start, partition.end))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([partition.page] * len(ids), type=pa.int64()),
                pa.array(ids, type=pa.int64()),
                pa.array([f"row-{i}" for i in ids], type=pa.string()),
                pa.array([row_hash(i) for i in ids], type=pa.int64()),
            ],
            names=["page", "row_id", "row_key", "row_hash"],
        )


class PagedRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: one page per micro-batch, offset = next unread
    row_id. ``read(start)`` is a PURE FUNCTION of the start offset (the
    rows are deterministic), which is exactly what makes the protocol
    restart-safe: a rerun from a checkpoint re-derives the same page, and
    ``readBetweenOffsets`` replays any committed-but-unflushed range
    bit-identically. This is the ``taskfn`` docstring's unimplemented
    "or streaming" aspiration (word-count-taskfile.lua:81) made real.

    The simple-reader API prefetches on the DRIVER by design (Spark
    routes low-volume control-plane streams through it); the volume path
    of this source is the partition-planned Arrow batch reader above —
    the stream face exists to pin offsets, commits, and replay."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.page_size = int(options.get("page_size", 1_250))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, lo: int, hi: int):
        # list iterator, NOT a generator: Spark's prefetch cache copy.copy()s
        # the iterator, and generators aren't copyable.
        return iter(
            [
                (i // self.page_size, i, f"row-{i}", row_hash(i))
                for i in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = int(start["row"])
        if lo >= self.n_rows:
            return iter(()), {"row": lo}
        hi = min(lo + self.page_size, self.n_rows)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["row"]), int(end["row"]))


class PagedRowsDataSource(DataSource):
    """``spark.read.format("lmrs_paged_rows").option("n_rows", N)
    .option("page_size", P).load()`` — and the same format under
    ``spark.readStream`` (one page per micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "lmrs_paged_rows"

    def schema(self) -> str:
        return PAGED_ROWS_SCHEMA

    def reader(self, schema) -> PagedRowsReader:
        return PagedRowsReader(self.options)

    def simpleStreamReader(self, schema) -> PagedRowsStreamReader:
        return PagedRowsStreamReader(self.options)


def register_paged_rows(spark) -> None:
    """Idempotent registration (the driver contract calls query functions
    on a session this module never saw). Python-source filter pushdown is
    off by default (Spark 4.1) and a reader implementing pushFilters hard
    fails without it, so enable the runtime conf alongside.

    The conf is DELIBERATELY sticky (session-wide, not save/restored
    here): query functions return LAZY DataFrames, and the pushFilters
    call happens at plan time — i.e. when the caller collects, after this
    function has long returned — so a scoped restore would re-break the
    very plan it was set for. The change is visible to any OTHER Python
    data source used later on the same session; that is additive for
    sources without pushFilters (the conf only gates whether Spark calls
    it) and a documented behavior change for sources that implement it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedRowsDataSource)

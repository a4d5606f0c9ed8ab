"""Tests for scale_ops: bloom prefilter, stratified sample, z-order layout.

Value-level correctness is covered by the oracle parity suite
(test_oracle_parity.py — all three queries carry full DuckDB oracles);
these tests assert the SCALE mechanics: the bloom filter actually prunes
probe rows with low false-positive rate and survives in the physical plan,
the stratified sample hits exact quotas through a WindowGroupLimit plan,
and z-order files carry narrow footer ranges on BOTH dimensions.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.operators.scale_ops import (  # noqa: F401
    _STRATA_QUOTA,
    bloom_prune_stats,
    curation_stratified_sample,
    join_bloom_prefilter,
    write_zorder_parquet,
)
from tests.conftest import SF_MEDIUM


def test_bloom_prefilter_prunes_probe_side(spark):
    row = bloom_prune_stats(spark, SF_MEDIUM).collect()[0]
    # The segment predicate keeps ~1/5 of customers, so ~1/5 of orders
    # truly match; the bloom must pass those plus a small fp tail.
    assert row.n_pass >= row.n_matched  # no false negatives, ever
    assert row.n_pass < 0.35 * row.n_probe  # prunes >= 65% of the shuffle
    fp = (row.n_pass - row.n_matched) / max(row.n_probe - row.n_matched, 1)
    assert fp < 0.05, f"false-positive rate {fp:.3f} too high"


def test_bloom_filter_survives_in_plan(spark):
    plan = join_bloom_prefilter(spark, SF_MEDIUM)._jdf.queryExecution().executedPlan().toString()
    # The probe-side membership test must still be there (not optimized
    # away): the O(1) word-index bit tests in a Filter above the orders
    # scan (element_at into the dense bitset + unsigned shift).
    assert "shiftrightunsigned" in plan and "element_at" in plan


def test_stratified_sample_exact_quotas(spark):
    docs = load_table(spark, SF_MEDIUM, "documents")
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {
        r.source: r.n
        for r in curation_stratified_sample(spark, SF_MEDIUM)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(sizes)
    for src, n in got.items():
        assert n == min(_STRATA_QUOTA, sizes[src]), src


def test_stratified_sample_uses_window_group_limit(spark):
    plan = (
        curation_stratified_sample(spark, SF_MEDIUM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The rn <= quota filter must compile to WindowGroupLimit so each
    # stratum is truncated map-side before the window shuffle.
    assert "WindowGroupLimit" in plan


def _footer_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_zorder_files_narrow_in_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_MEDIUM, "events").selectExpr(
        "event_id",
        "CAST(user_id AS BIGINT) AS uid",
        "(CAST(unix_timestamp(ts) AS BIGINT) DIV 3600) % 1024 AS hour_idx",
    )
    zpath = str(tmp_path / "zorder")
    write_zorder_parquet(ev, zpath, "uid", "hour_idx", n_files=16)

    stats = {c: _footer_ranges(zpath, c) for c in ("uid", "hour_idx")}
    spans = {}
    for col, ranges in stats.items():
        assert len(ranges) >= 8, f"expected many files, got {len(ranges)}"
        glo = min(lo for lo, _ in ranges)
        ghi = max(hi for _, hi in ranges)
        avg_span = sum(hi - lo for lo, hi in ranges) / len(ranges)
        spans[col] = avg_span / max(ghi - glo, 1)
    # A 1-D sort on either column leaves the OTHER column's per-file span
    # ~= the global range (ratio ~1.0). Z-order must be narrow on BOTH.
    assert spans["uid"] < 0.7, spans
    assert spans["hour_idx"] < 0.7, spans


def test_zorder_morton_deinterleave_roundtrip(spark):
    """De-interleaving z in plain Python must recover (zx, zy) exactly —
    the property that makes z-range file pruning sound for both columns."""
    from lua_mapreduce_spark.operators.scale_ops import _Z_BITS, layout_zorder_keys

    rows = layout_zorder_keys(spark, SF_MEDIUM).limit(2000).collect()
    assert rows
    for r in rows:
        x = y = 0
        for i in range(_Z_BITS):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.zx, r.zy), (r.z, x, y, r.zx, r.zy)


def test_bitmap_distinct_shuffles_words_not_keys(spark):
    """The first aggregate must carry bit_or-packed words (map-side
    combinable, <= 1/64th the distinct keys) — not raw expanded keys."""
    from lua_mapreduce_spark.operators.scale_ops import agg_bitmap_distinct

    plan = (
        agg_bitmap_distinct(spark, SF_MEDIUM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "bit_or" in plan and "bit_count" in plan
    # COUNT(DISTINCT) would compile through an Expand node; the bitmap
    # path must not.
    assert "Expand" not in plan


def test_proportional_quotas_sum_exactly_to_budget(spark):
    """Hamilton apportionment: the per-source quotas sum to the budget
    EXACTLY (no rounding drift), every source with rows gets at least its
    floor share, and the picked sample hits the budget row count."""
    from pyspark.sql import functions as F

    from lua_mapreduce_spark.operators.scale_ops import (
        _PROP_BUDGET,
        curation_proportional_sample,
    )

    rows = curation_proportional_sample(spark, SF_MEDIUM).collect()
    assert len(rows) == _PROP_BUDGET
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    for source, picked in by_source.items():
        floor_share = (_PROP_BUDGET * counts[source]) // total
        assert floor_share <= len(picked) <= floor_share + 1
        assert len(picked) == picked[0].quota == max(p.rn for p in picked)


def test_explode_outer_preserves_empty_array_parents(spark):
    """Every document appears in the output: empty match lists surface as
    (doc_id, NULL, NULL) rows instead of disappearing."""
    from lua_mapreduce_spark.operators import QUERIES

    rows = QUERIES["scalar_explode_outer"](spark, SF_MEDIUM).collect()
    docs_out = {r.doc_id for r in rows}
    n_docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet").count()
    assert len(docs_out) == n_docs
    null_rows = [r for r in rows if r.token is None]
    assert null_rows and all(r.pos is None for r in null_rows)
    non_null = [r for r in rows if r.token is not None]
    assert all(r.token.startswith("q") for r in non_null)

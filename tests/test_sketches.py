"""Sketch aggregates: HLL estimates must land near the exact counts."""

from __future__ import annotations

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM


def test_approx_percentile_within_error(spark):
    rows = QUERIES["agg_approx_percentile_sketch"](spark, SF_MEDIUM).collect()
    assert rows, "no groups"
    for r in rows:
        rel_err = abs(r.p50_approx - r.p50_exact) / max(abs(r.p50_exact), 1e-9)
        assert rel_err < 0.05, f"{r.o_orderstatus}: {rel_err:.4f}"


def test_approx_distinct_within_error(spark):
    rows = QUERIES["agg_approx_distinct_sketch"](spark, SF_MEDIUM).collect()
    assert rows, "no groups"
    for r in rows:
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        # rsd=0.02 => 3-sigma bound ~6%; generous margin for small groups.
        assert rel_err < 0.10, f"{r.l_returnflag}: {rel_err:.3f}"

"""Event-analytics property tests beyond oracle parity (which covers
value-level correctness for every events_* query in test_oracle_parity)."""

from __future__ import annotations

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM


def test_anomaly_hours_nonvacuous_and_bounded(spark):
    """The 3-sigma integer test actually fires on the synthetic firehose
    (both flag values present — a never-true predicate would pass parity
    vacuously) and the trailing RANGE frame never exceeds 24 base hours."""
    rows = QUERIES["events_anomaly_hours"](spark, SF_MEDIUM).collect()
    flags = {r.is_anomaly for r in rows}
    assert flags == {True, False}
    assert all(0 <= r.base_cnt <= 24 for r in rows)
    assert all(r.base_sumsq >= 0 and r.base_sum >= 0 for r in rows)

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


def test_markov_transitions_rows_and_mass(spark):
    """Transition counts account for every non-first event, probabilities
    row-normalize to <= 1000 permille per previous state (truncation can
    only lose mass), and the matrix is bounded by |types|^2."""
    from pyspark.sql import functions as F

    from lua_mapreduce_spark.operators import QUERIES

    rows = QUERIES["events_markov_transitions"](spark, SF_MEDIUM).collect()
    ev = spark.read.parquet(f"{SF_MEDIUM}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    assert 0 < len(rows) <= n_types * n_types
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r.p_permille)
        assert 0 <= r.p_permille <= 1000
    for prev, ps in by_prev.items():
        assert 1000 - len(ps) < sum(ps) <= 1000, prev

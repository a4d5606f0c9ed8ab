"""Event-analytics property tests beyond oracle parity (which covers
value-level correctness for every events_* query in test_oracle_parity)."""

from __future__ import annotations

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL


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


def test_seasonal_decompose_identities(spark):
    """Trend is bounded by the window's min/max, hod means are consistent
    per hour-of-day, and deviation is the exact milli identity."""
    import collections

    rows = QUERIES["events_seasonal_decompose"](spark, SF_SMALL).collect()
    assert rows
    by_hod = collections.defaultdict(list)
    for r in rows:
        by_hod[r.hod].append(r.n)
        assert r.deviation_milli == 1000 * r.n - r.hod_mean_milli
    for r in rows:
        assert r.hod_mean_milli == (1000 * sum(by_hod[r.hod])) // len(by_hod[r.hod])
    # trend replay: centered +/-12h mean over the hourly series
    series = {r.hr_epoch: r.n for r in rows}
    for r in rows:
        window = [
            n for e, n in series.items() if abs(e - r.hr_epoch) <= 12 * 3600
        ]
        assert r.trend_milli == (1000 * sum(window)) // len(window)


def test_path_analysis_replay(spark):
    """The top path's count replays exactly from raw events."""
    import collections

    rows = QUERIES["events_path_analysis"](spark, SF_SMALL).collect()
    assert rows and rows[0].rank == 1
    counts = [r.n_user_days for r in rows]
    assert counts == sorted(counts, reverse=True)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    journeys = collections.defaultdict(list)
    for e in ev:
        journeys[(e.user_id, e.ts.strftime("%Y-%m-%d"))].append(
            (e.ts, e.event_id, e.event_type)
        )
    paths = collections.Counter(
        ">".join(t[2] for t in sorted(v)[:32]) for v in journeys.values()
    )
    top = rows[0]
    assert paths[top.path] == top.n_user_days
    assert top.n_user_days == max(paths.values())

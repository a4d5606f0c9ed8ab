"""Structured Streaming twins must agree with their batch oracles once the
stream drains (availableNow)."""

from __future__ import annotations

import shutil

import pytest

from lua_mapreduce_spark.operators.events import (
    events_session_windows,
    events_tumbling_hourly,
)
from lua_mapreduce_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    stream_session_windows,
    stream_tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMALL}/events.parquet", d / "events.parquet")
    return str(d)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_matches_batch(spark, events_dir):
    stream = stream_tumbling_counts(read_events_stream(spark, events_dir))
    result = run_to_memory_sink(stream, "t_tumbling")
    batch = events_tumbling_hourly(spark, SF_SMALL)
    cols = ["ws_epoch", "event_type", "n_events", "sum_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_stream_sessions_match_batch(spark, events_dir):
    stream = stream_session_windows(read_events_stream(spark, events_dir))
    result = run_to_memory_sink(stream, "t_sessions")
    batch = events_session_windows(spark, SF_SMALL)
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_watermark_bounds_state(spark, events_dir):
    """The streaming plan carries an event-time watermark (state bound)."""
    stream = stream_tumbling_counts(read_events_stream(spark, events_dir))
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan

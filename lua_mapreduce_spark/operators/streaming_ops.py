"""Structured Streaming operators registered as driver-checkable queries.

Each entry runs a true streaming pipeline (readStream file source → stateful
transformation → availableNow drain into a memory sink) and returns the
drained table. They are registered WITHOUT oracles — custom stateful
streaming is the brief's canonical non-SQL-expressible case — but the
pytest suite asserts each agrees with its batch twin where one exists
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.streaming.stateful import (
    drain_stream,
    stream_dedup_events,
    stream_sliding_counts,
    stream_user_totals_stateful,
)
from lua_mapreduce_spark.streaming.windows import read_events_stream


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_events_stream(spark, sf_dir, glob="events.parquet")


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary keyed state (applyInPandasWithState): running per-user
    totals after the stream drains."""
    return drain_stream(
        stream_user_totals_stateful(_events_stream(spark, sf_dir)),
        "stateful_user_totals",
        output_mode="update",
    )


def streaming_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark-bounded exact dedup; returns surviving-row count
    per event_type (small, stable output for the driver's check)."""
    deduped = drain_stream(
        stream_dedup_events(_events_stream(spark, sf_dir)),
        "stream_dedup",
        output_mode="append",
    )
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming agg (2h window, 1h slide) after drain."""
    return drain_stream(
        stream_sliding_counts(_events_stream(spark, sf_dir)),
        "stream_sliding",
        output_mode="complete",
    )


QUERIES = {
    "streaming_user_totals": streaming_user_totals,
    "streaming_dedup_count": streaming_dedup_count,
    "streaming_sliding_counts": streaming_sliding_counts,
}

ORACLES: dict[str, str] = {}

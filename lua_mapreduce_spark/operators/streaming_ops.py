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

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.streaming.stateful import (
    drain_stream,
    stream_dedup_events,
    stream_sliding_counts,
    stream_static_enrich,
    stream_stream_attribution,
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


def streaming_static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with a batch-derived
    user tier, counted per (tier, event_type) after drain."""
    ev_batch = load_table(spark, sf_dir, "events")
    # Tier threshold on the EXACT decimal sum: a float SUM(double) is
    # association-order-dependent and a user near the boundary could flip
    # tiers between engines/runs.
    user_dim = ev_batch.groupBy("user_id").agg(
        F.when(
            F.expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)") > 1000.0,
            "high",
        )
        .otherwise("low")
        .alias("user_tier")
    )
    enriched = drain_stream(
        stream_static_enrich(_events_stream(spark, sf_dir), user_dim),
        "stream_enrich",
        output_mode="append",
    )
    return enriched.groupBy("user_tier", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase <- click within 1h), counted
    per user after drain; watermarks bound the join state."""
    joined = drain_stream(
        stream_stream_attribution(_events_stream(spark, sf_dir)),
        "stream_ssjoin",
        output_mode="append",
    )
    return joined.groupBy("p_user").agg(F.count(F.lit(1)).alias("n_attributed"))


QUERIES = {
    "streaming_user_totals": streaming_user_totals,
    "streaming_dedup_count": streaming_dedup_count,
    "streaming_sliding_counts": streaming_sliding_counts,
    "streaming_static_enrich_counts": streaming_static_enrich_counts,
    "streaming_stream_stream_join": streaming_stream_stream_join,
}

# Both joins drain completely under availableNow (no late data in a finite
# backfill), so their results equal the batch formulations — full oracles.
STATIC_ENRICH_ORACLE = """
WITH dim AS (
  SELECT user_id,
         CASE WHEN CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) > 1000.0
              THEN 'high' ELSE 'low' END AS user_tier
  FROM events GROUP BY user_id)
SELECT user_tier, event_type, COUNT(*) AS n_events
FROM events JOIN dim USING (user_id)
GROUP BY 1, 2
"""

STREAM_STREAM_ORACLE = """
SELECT p.user_id AS p_user, COUNT(*) AS n_attributed
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY 1
"""

ORACLES: dict[str, str] = {
    "streaming_static_enrich_counts": STATIC_ENRICH_ORACLE,
    "streaming_stream_stream_join": STREAM_STREAM_ORACLE,
}

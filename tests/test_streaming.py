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


def test_stateful_user_totals_match_batch(spark, events_dir):
    """applyInPandasWithState running totals == batch groupBy after drain."""
    from pyspark.sql import functions as F

    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.streaming import drain_stream, stream_user_totals_stateful

    result = drain_stream(
        stream_user_totals_stateful(read_events_stream(spark, events_dir)),
        "t_stateful",
        output_mode="update",
    )
    batch = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id") < 100)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in result.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in batch.collect()}
    assert got == want


def test_stream_dedup_bounded_state(spark, events_dir):
    """dropDuplicatesWithinWatermark drains and never exceeds input count."""
    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.streaming import drain_stream, stream_dedup_events

    deduped = drain_stream(
        stream_dedup_events(read_events_stream(spark, events_dir)),
        "t_dedup",
        output_mode="append",
    )
    n_in = load_table(spark, SF_SMALL, "events").count()
    n_distinct = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "ts")
        .distinct()
        .count()
    )
    assert deduped.count() == n_distinct <= n_in


def test_file_sink_exactly_once_on_restart(spark, events_dir, tmp_path):
    """availableNow + checkpoint -> parquet sink: restarting the drained
    query emits NO duplicate rows (the checkpoint + file-sink commit log
    give end-to-end exactly-once for file outputs)."""
    from lua_mapreduce_spark.catalog import load_table

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain_once():
        q = (
            read_events_stream(spark, events_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain_once()
    drain_once()  # restart against the same checkpoint: must be a no-op
    n_in = load_table(spark, SF_SMALL, "events").count()
    assert spark.read.parquet(out).count() == n_in


def test_stateful_recovery_across_restart(spark, tmp_path):
    """Keyed state survives a query restart via the checkpoint: feeding the
    same events twice (second file added between runs) yields cumulative
    totals — exactly double the single-pass counts."""
    import shutil

    from pyspark.sql import functions as F

    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.streaming import stream_user_totals_stateful

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "batch1.parquet")

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    def drain():
        q = (
            stream_user_totals_stateful(read_events_stream(spark, str(src)))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "batch2.parquet")
    drain()

    single = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id") < 100)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    latest = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max_by("n_events", "batch_id").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in latest.collect()}
    assert got == {u: 2 * n for u, n in single.items()}


def test_watermark_bounds_state(spark, events_dir):
    """The streaming plan carries an event-time watermark (state bound)."""
    stream = stream_tumbling_counts(read_events_stream(spark, events_dir))
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan

"""Python DataSource WRITER (sources/python_datasink.py): the two-phase
commit/abort protocol and the manifest-resolved read-back.

The external gate (sink_python_datasource / streaming_sink_python_datasource
oracles) proves a SUCCESSFUL write is lossless; these tests pin the failure
half of the contract — a failed task publishes nothing, abort leaves no
visible output, epoch retries commit idempotently — which SQL oracles
cannot express.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from lua_mapreduce_spark.sources.python_datasink import (
    ShardCommit,
    ShardedStreamSinkWriter,
    committed_files,
    read_sharded_sink,
    register_sharded_sink,
)


def _write(df, path, mode="overwrite"):
    df.write.format("lmrs_sharded_sink").mode(mode).save(path)


def test_roundtrip_exact(spark, tmp_path):
    register_sharded_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    _write(df.repartition(4), path)
    back = read_sharded_sink(spark, path, "k BIGINT, v BIGINT")
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 3) for i in range(100)
    ]
    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4


def test_failed_task_publishes_nothing(spark, tmp_path):
    """A mid-write task failure must abort the whole write: no manifest,
    read-back empty — regardless of how many OTHER tasks had already
    staged their shards (abort deletes the messaged ones; any unmessaged
    orphan is invisible to the manifest-resolved reader by design)."""
    register_sharded_sink(spark)
    path = str(tmp_path / "sink_fail")

    @F.udf("long")
    def boom(v):
        if v == 7:
            raise ValueError("synthetic task failure")
        return v

    df = spark.range(100).repartition(4).select(boom("id").alias("k"))
    with pytest.raises(Exception):
        _write(df, path)
    assert not os.path.exists(os.path.join(path, "_MANIFEST.json"))
    assert committed_files(path) == []
    assert read_sharded_sink(spark, path, "k BIGINT").count() == 0


def test_append_merges_overwrite_replaces(spark, tmp_path):
    register_sharded_sink(spark)
    path = str(tmp_path / "sink_modes")
    _write(spark.range(0, 50).repartition(2), path, "overwrite")
    _write(spark.range(50, 80).repartition(2), path, "append")
    back = read_sharded_sink(spark, path, "id BIGINT")
    assert sorted(r.id for r in back.collect()) == list(range(80))
    _write(spark.range(0, 10).repartition(2), path, "overwrite")
    back = read_sharded_sink(spark, path, "id BIGINT")
    assert sorted(r.id for r in back.collect()) == list(range(10))


def test_empty_partition_publishes_no_file(spark, tmp_path):
    register_sharded_sink(spark)
    path = str(tmp_path / "sink_empty")
    # 4 rows over 8 round-robin partitions: round-robin may pack them into
    # fewer partitions, but some of the 8 are certainly empty — and an
    # empty shard must publish NO file (and no 0-row parquet clutter).
    df = spark.range(4).repartition(8)
    nonempty = df.rdd.glom().map(len).filter(lambda n: n > 0).count()
    assert nonempty < 8
    _write(df, path)
    assert len(committed_files(path)) == nonempty
    assert read_sharded_sink(spark, path, "id BIGINT").count() == 4


def test_stream_epoch_commit_is_idempotent(tmp_path):
    """A retried epoch re-commits the SAME batchId: the manifest is
    overwritten atomically, so readers see one copy of the epoch no
    matter how many attempts committed it."""
    path = str(tmp_path / "stream_sink")
    os.makedirs(path)
    w = ShardedStreamSinkWriter({"path": path})
    msgs = [ShardCommit("_staged/f1.parquet", 5), None]
    w.commit(msgs, 3)
    w.commit(msgs, 3)  # epoch retry
    manifests = glob.glob(os.path.join(path, "_manifest-batch-*.json"))
    assert len(manifests) == 1
    data = json.load(open(manifests[0]))
    assert data["batch_id"] == 3
    assert [f["file"] for f in data["files"]] == ["_staged/f1.parquet"]


def test_stream_manifests_resolve_in_epoch_order(tmp_path):
    path = str(tmp_path / "stream_order")
    os.makedirs(path)
    w = ShardedStreamSinkWriter({"path": path})
    w.commit([ShardCommit("_staged/b10.parquet", 1)], 10)
    w.commit([ShardCommit("_staged/b2.parquet", 1)], 2)
    got = [os.path.basename(f) for f in committed_files(path)]
    assert got == ["b2.parquet", "b10.parquet"]  # numeric, not lexical


def test_stream_failed_epoch_publishes_nothing(spark, tmp_path):
    """A real streaming write whose batch FAILS mid-epoch (UDF bomb on
    the stream side) must leave NO epoch manifest: the sink read-back
    stays empty no matter what was staged before the failure."""
    register_sharded_sink(spark)
    path = str(tmp_path / "stream_fail")
    os.makedirs(path)

    # Bomb on value 0 — the FIRST row the rate source ever emits — so
    # every non-empty batch fails deterministically; no batch can commit
    # a non-empty manifest before the failure.
    @F.udf("long")
    def boom(v):
        if v == 0:
            raise ValueError("synthetic stream failure")
        return v

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(boom(F.col("value")).alias("k"))
    )
    q = (
        src.writeStream.format("lmrs_sharded_sink")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "ckpt_fail"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination(60)
    # Epochs that committed BEFORE the bomb may exist but only as empty
    # manifests (the rate stream ramps up); the failed epoch itself must
    # have published nothing — no committed files, empty read-back.
    for m in glob.glob(os.path.join(path, "_manifest-batch-*.json")):
        assert json.load(open(m))["files"] == []
    assert committed_files(path) == []
    assert read_sharded_sink(spark, path, "k BIGINT").count() == 0


def test_stream_abort_deletes_staged(tmp_path):
    path = str(tmp_path / "stream_abort")
    staged = os.path.join(path, "_staged")
    os.makedirs(staged)
    f = os.path.join(staged, "x.parquet")
    open(f, "w").write("stub")
    w = ShardedStreamSinkWriter({"path": path})
    w.abort([ShardCommit("_staged/x.parquet", 1), None], 0)
    assert not os.path.exists(f)
    assert committed_files(path) == []


def test_roundtrip_through_scheme_path(spark, tmp_path):
    """The pyarrow-FileSystem branch end-to-end: a file:// URI forces
    every staging/manifest/list call through _fs_for's scheme path (the
    same code path hdfs:// and s3:// take), not the POSIX fast path —
    the r10 verdict's shared-mount assumption, closed."""
    register_sharded_sink(spark)
    path = "file://" + str(tmp_path / "sink_uri")
    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    _write(df.repartition(3), path)
    # no .tmp manifest leftovers; the published manifest is exact JSON
    local = str(tmp_path / "sink_uri")
    names = os.listdir(local)
    assert "_MANIFEST.json" in names
    assert not any(n.endswith(".tmp") for n in names)
    manifest = json.load(open(os.path.join(local, "_MANIFEST.json")))
    assert manifest["total_rows"] == 60
    assert len(manifest["files"]) == 3
    back = read_sharded_sink(spark, path, "k BIGINT, v BIGINT")
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 7) for i in range(60)
    ]


def test_stream_commit_and_abort_through_scheme_path(tmp_path):
    """Streaming-face helpers against a file:// URI: epoch publish via
    tmp + fs.move, exact-name resolution, staged delete on abort."""
    path = "file://" + str(tmp_path / "stream_uri")
    local = str(tmp_path / "stream_uri")
    os.makedirs(local)
    w = ShardedStreamSinkWriter({"path": path})
    w.commit([ShardCommit("_staged/a.parquet", 5)], 0)
    w.commit([ShardCommit("_staged/b.parquet", 6)], 1)
    assert committed_files(path) == [
        os.path.join(path, "_staged/a.parquet"),
        os.path.join(path, "_staged/b.parquet"),
    ]
    assert not any(n.endswith(".tmp") for n in os.listdir(local))
    # abort removes a staged file through the filesystem API
    staged = os.path.join(local, "_staged")
    os.makedirs(staged)
    open(os.path.join(staged, "x.parquet"), "w").write("stub")
    w.abort([ShardCommit("_staged/x.parquet", 1)], 2)
    assert not os.path.exists(os.path.join(staged, "x.parquet"))

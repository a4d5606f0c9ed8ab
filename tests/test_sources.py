"""Sources & sinks: round-trips and the reference-faithful whole-file scan
(example/word-count-taskfile.lua:41-65)."""

from __future__ import annotations

import os

from lua_mapreduce_spark.sources import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    whole_text_files,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
from tests.test_mapreduce_api import FIXTURES


def _write_fixture_dir(tmp_path):
    d = tmp_path / "texts"
    d.mkdir()
    for name, content in FIXTURES.items():
        (d / name).write_text(content)
    (d / "ignore.dat").write_text("binary-ish noise")
    return str(d)


def test_whole_text_files_matches_reference_source(spark, tmp_path):
    """One row per *.txt file with full contents — the exact taskfn shape;
    the .txt filter mirrors word-count-taskfile.lua:53."""
    d = _write_fixture_dir(tmp_path)
    rows = {(r.filename, r.content) for r in whole_text_files(spark, d).collect()}
    assert rows == set(FIXTURES.items())


def test_text_reader_line_oriented(spark, tmp_path):
    d = _write_fixture_dir(tmp_path)
    df = read_text(spark, os.path.join(d, "test1.txt"))
    assert [r.value for r in df.collect()] == ["This is a test."]


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "pq")
    write_parquet(df, path)
    back = read_parquet(spark, path)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_parquet_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02")], "id long, v string, day string"
    )
    path = str(tmp_path / "pq_part")
    write_parquet(df, path, partition_by=["day"])
    assert os.path.isdir(os.path.join(path, "day=2024-01-01"))
    back = read_parquet(spark, path)
    assert back.count() == 2


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema="id long, name string")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "json")
    write_json(df, path)
    back = read_json(spark, path, schema="id long, name string")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_json_corrupt_record_tolerance(spark, tmp_path):
    """Malformed rows land in _corrupt_record instead of failing the read —
    at 100 TB some fraction of any real corpus is malformed, and a pipeline
    that dies on row 3 billion is not a pipeline. PERMISSIVE is Spark's
    default; asserted here so a config change can't silently flip it."""
    p = tmp_path / "mixed.json"
    p.write_text('{"id": 1, "name": "ok"}\n{broken json!!\n{"id": 2, "name": "also ok"}\n')
    df = read_json(
        spark, str(p), schema="id long, name string, _corrupt_record string"
    )
    rows = df.collect()
    good = {(r.id, r.name) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {(1, "ok"), (2, "also ok")}
    assert bad == ["{broken json!!"]


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_binary_file_source(spark, tmp_path):
    """Raw-bytes multimodal ingest: one row per file, content is the exact
    byte string, and the glob filter prunes non-matching files."""
    d = tmp_path / "blobs"
    d.mkdir()
    payload = bytes(range(256))
    (d / "img1.bin").write_bytes(payload)
    (d / "img2.bin").write_bytes(payload[:16])
    (d / "skip.txt").write_text("not a blob")
    df = read_binary_files(spark, str(d), pattern="*.bin")
    rows = {(os.path.basename(r.path), bytes(r.content), r.length) for r in df.collect()}
    assert rows == {("img1.bin", payload, 256), ("img2.bin", payload[:16], 16)}


def test_clustered_write_narrows_file_ranges(spark, tmp_path):
    """write_clustered_parquet must produce files whose parquet footer
    min/max for the cluster column are near-disjoint narrow slices —
    hard evidence (read via pyarrow, independent of Spark) that a reader
    filtering on that column can skip whole files. A naive write of the
    same data leaves every file spanning ~the full range, so the same
    filter reads everything."""
    import glob

    import pyarrow.parquet as pq

    from lua_mapreduce_spark.sources import read_parquet, write_clustered_parquet

    li = read_parquet(spark, "/root/testdata/sf0.01/lineitem.parquet")
    n_files = 4

    clustered = str(tmp_path / "clustered")
    write_clustered_parquet(li, clustered, ["l_shipdate"], n_files)
    naive = str(tmp_path / "naive")
    li.repartition(n_files).write.parquet(naive)

    def file_ranges(path):
        ranges = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("l_shipdate")
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            ranges.append((lo, hi))
        return ranges

    cl = file_ranges(clustered)
    nv = file_ranges(naive)
    assert len(cl) == n_files

    # Clustered files tile the range: sorted by min, each file's range ends
    # before the next one begins (boundary equality allowed for ties).
    cl.sort()
    for (_, hi), (lo2, _) in zip(cl, cl[1:]):
        assert hi <= lo2, f"clustered file ranges overlap: {cl}"

    # Every naive file spans (almost) the whole global range — the layout
    # a filter can never prune; the clustered spans are each a fraction.
    glo = min(lo for lo, _ in nv)
    ghi = max(hi for _, hi in nv)
    total = (ghi - glo).total_seconds()
    for lo, hi in nv:
        assert (hi - lo).total_seconds() > 0.6 * total
    widths = [(hi - lo).total_seconds() for lo, hi in cl]
    assert max(widths) < 0.6 * total

    # And the data survives the layout intact.
    assert read_parquet(spark, clustered).count() == li.count()


def test_clustered_write_compacts_small_files(spark, tmp_path):
    """The same helper is the small-file compactor: many tiny input files
    in, target file count out, bytes and rows preserved."""
    import glob

    from lua_mapreduce_spark.sources import read_parquet, write_clustered_parquet

    li = read_parquet(spark, "/root/testdata/sf0.01/lineitem.parquet")
    shattered = str(tmp_path / "shattered")
    li.repartition(64).write.parquet(shattered)  # the 100 TB anti-pattern
    assert len(glob.glob(f"{shattered}/*.parquet")) == 64

    compacted = str(tmp_path / "compacted")
    write_clustered_parquet(read_parquet(spark, shattered), compacted, ["l_orderkey"], 4)
    assert len(glob.glob(f"{compacted}/*.parquet")) == 4
    assert read_parquet(spark, compacted).count() == li.count()


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 native XML: write rows under a rowTag, read them back with
    an explicit schema (inference-free, so types survive)."""
    from lua_mapreduce_spark.sources import read_parquet, read_xml, write_xml

    nation = read_parquet(spark, "/root/testdata/sf0.01/nation.parquet")
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation")
    back = read_xml(
        spark,
        path,
        row_tag="nation",
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    assert sorted(back.columns) == sorted(nation.columns)
    a = {tuple(r) for r in nation.select(*sorted(nation.columns)).collect()}
    b = {tuple(r) for r in back.select(*sorted(back.columns)).collect()}
    assert a == b


def test_variant_ingestion_extracts_typed_fields(spark):
    """events.props (a JSON string) parses ONCE into a VARIANT column;
    variant_get then serves typed extractions without re-parsing, and the
    values agree with the classic get_json_object path."""
    from pyspark.sql import functions as F

    from lua_mapreduce_spark.sources import parse_variant, read_parquet

    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet").limit(200)
    v = parse_variant(ev, "props")
    assert v.schema["v"].dataType.typeName() == "variant"
    got = v.select(
        "event_id",
        F.expr("variant_get(v, '$.device', 'string')").alias("device"),
    ).collect()
    classic = {
        r.event_id: r.device
        for r in ev.select(
            "event_id", F.get_json_object("props", "$.device").alias("device")
        ).collect()
    }
    assert {r.event_id: r.device for r in got} == classic

"""Sources and sinks.

The reference's only source is a directory scan slurping whole text files
(`read_source`, example/word-count-taskfile.lua:41-65: lfs.dir + io.read
"*all", `.txt` filter at :53), and its only sink is print-to-stdout
(finalfn, word-count-taskfile.lua:91-97). `whole_text_files` reproduces the
source exactly; everything else is the engine-proper surface the reference
lacks: schema-aware columnar readers and distributed writers.

Scale notes: all readers return lazy DataFrames feeding Catalyst (pushdown/
pruning reach the file format); writers are executor-parallel — no
driver-side materialization anywhere, in contrast to the reference's
server-memory dataflow (lua-mapreduce-server.lua:31-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lua_mapreduce_spark.session import configure_runtime


def whole_text_files(spark: SparkSession, path: str, pattern: str = "*.txt") -> DataFrame:
    """Reference-faithful source: one row per file, (filename, content) —
    the exact shape taskfn yields (word-count-taskfile.lua:85-87).
    Filename is the basename, matching the Lua `file` key."""
    configure_runtime(spark)
    rdd = spark.sparkContext.wholeTextFiles(f"{path}/{pattern}")
    rdd = rdd.map(lambda kv: (kv[0].rsplit("/", 1)[-1], kv[1]))
    return spark.createDataFrame(rdd, schema="filename string, content string")


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return configure_runtime(spark).read.text(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return configure_runtime(spark).read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    reader = configure_runtime(spark).read.options(header="true", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    reader = configure_runtime(spark).read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other splittable columnar format Spark ships natively;
    same pushdown/pruning path as parquet."""
    return configure_runtime(spark).read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """XML source — native in Spark 4 (the spark-xml package was folded
    into core): one row per ``row_tag`` element, schema inferred or
    supplied. Same Catalyst scan path as json (element pruning applies
    when a schema is given)."""
    reader = (
        configure_runtime(spark)
        .read.format("xml")
        .option("rowTag", row_tag)
        .options(**options)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def parse_variant(df: DataFrame, json_col: str, out_col: str = "v") -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type: parse a JSON
    string column once into the binary variant encoding; downstream
    ``variant_get(v, '$.path', 'type')`` extractions then read the typed
    binary directly — the open-format answer to schema-on-read JSON
    columns (shredded storage, no per-query re-parse, fields that differ
    in type across rows stay accessible)."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, F.parse_json(F.col(json_col)))


def read_binary_files(spark: SparkSession, path: str, pattern: str = "*") -> DataFrame:
    """Multimodal ingest: one row per file with (path, modificationTime,
    length, content binary) — the raw-bytes source for image/audio/video
    columns (decode happens downstream via mapInPandas, multimodal.py).
    Unlike wholeTextFiles this is a DataFrame source: the scan is
    Catalyst-planned and `length`/`path` predicates prune before bytes are
    read."""
    return (
        configure_runtime(spark)
        .read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-cluster on `cluster_by` before writing: rows are range-
    partitioned into n_files buckets and sorted within each, so every
    output file carries a narrow, near-disjoint min/max range for the
    cluster columns in its parquet footer. Readers that filter on those
    columns then skip whole files/row-groups via footer statistics — the
    data-layout half of predicate pushdown, and the single cheapest scan
    optimization at 100 TB (sort once on write, save every subsequent
    scan). This is the same contract as Delta/Iceberg `CLUSTER BY` and
    the one-dimensional special case of Z-ordering.

    Also the small-file compaction tool: compacting a directory is
    `write_clustered_parquet(read_parquet(dir), out, keys, target_n)` —
    the range exchange both coalesces and lays out.
    """
    df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
        *cluster_by
    ).write.mode(mode).parquet(path)

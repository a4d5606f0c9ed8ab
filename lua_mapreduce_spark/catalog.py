"""Table catalog over the driver's parquet directories.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Design for scale: we always go through ``spark.read.parquet`` so Catalyst
sees a relation with pushdown-capable scan (PushedFilters / ReadSchema reach
the parquet reader). Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the physical ``ts`` encoding to session-TZ TIMESTAMP.

    The physical ts type has varied across testdata generations; both the
    batch reader (load_table) and the streaming reader
    (streaming.windows.read_events_stream) go through this one helper so a
    future third encoding can't silently diverge between the two paths.

    - bigint: TIMESTAMP(NANOS) read as int64 via nanosAsLong; truncate to
      µs. Second-exact intervals survive truncation (1800e9 ns ≡ 1800e6 µs),
      so window/session semantics are unaffected.
    - timestamp_ntz: newer Spark reads TIMESTAMP(MICROS) natively as
      TIMESTAMP_NTZ. Normalize to session-TZ TIMESTAMP (UTC, session.py) so
      downstream casts like CAST(ts AS LONG) — illegal on NTZ — keep working
      and the wall clock matches the DuckDB oracle's naive timestamps.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def parallelize_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a poorly-split scan up to cluster parallelism
    before CPU-heavy per-row work (tokenization, hashing, vector math).

    A small parquet file is a single input split, which would serialize the
    expensive projection on one core no matter how large the cluster. At
    real scale the scan already has >= cores splits and this is a no-op —
    the repartition only fires when the source under-splits, so it never
    introduces a full-table shuffle on a 100 TB input.
    """
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

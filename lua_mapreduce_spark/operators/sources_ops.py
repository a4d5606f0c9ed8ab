"""Query faces for the reader/writer surface (round 8): XML roundtrip and
VARIANT semi-structured extraction.

``sources/readers.py`` ships every format the engine reads and writes
(parquet/csv/json/text/orc/XML/binaryFile/VARIANT), test-verified in
tests/test_sources.py — but a reader without a registered query face never
hits the external oracle gate. These two queries put the newest surfaces
(Spark 4's native XML source/sink and the VARIANT type) on that gate:

- **XML roundtrip**: write a projection of ``customer`` as XML, read it
  back with an explicit schema (element pruning, no inference pass), and
  aggregate; the oracle aggregates the original parquet directly, so
  equality proves the write -> parse -> read cycle is lossless. Money is
  carried as integer cents across the XML hop — doubles through a text
  format round-trip shortest-repr, integers round-trip exactly.
- **VARIANT extraction**: parse the events ``props`` JSON column into the
  binary VARIANT encoding once, then read typed fields with
  ``variant_get`` — the shredded, parse-once answer to schema-on-read
  JSON. The oracle replays the extraction with DuckDB's JSON functions.

100 TB notes: the XML hop is bounded here (a query face must be
self-contained); the production path is the same writer/reader against a
distributed filesystem — both go through the Hadoop FS layer, and the
read side is a Catalyst scan that splits by file. VARIANT parse is one
projection (no Python), and extraction reads the typed binary without
re-parsing per field.

The reference engine reads newline files only (lua-mapreduce-utils
file_split; SURVEY.md §2.4 scans row); both formats extend its surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.sources.readers import (
    parse_variant,
    read_xml,
    write_xml,
)


def _tmp_out(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Per-(application, sf) temp dir (the streaming harness convention) so
    overwrite-mode reruns are idempotent and concurrent sessions never
    collide."""
    import os as _os
    import tempfile as _tempfile

    return _os.path.join(
        _tempfile.gettempdir(),
        f"lmrs_{tag}_"
        + spark.sparkContext.applicationId
        + "_"
        + _os.path.basename(_os.path.abspath(sf_dir)),
    )


def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").alias(
            "acctbal_cents"
        ),
    )
    out = _tmp_out(spark, sf_dir, "xml_roundtrip")
    write_xml(cust, out, row_tag="customer")
    back = read_xml(
        spark,
        out,
        row_tag="customer",
        schema="c_custkey BIGINT, c_nationkey BIGINT, acctbal_cents BIGINT",
    )
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("CAST(SUM(acctbal_cents) AS BIGINT)").alias("sum_cents"),
        F.min("c_custkey").alias("min_custkey"),
        F.max("c_custkey").alias("max_custkey"),
    )


XML_ROUNDTRIP_ORACLE = """
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(c_custkey) AS min_custkey,
       MAX(c_custkey) AS max_custkey
FROM customer GROUP BY 1
"""


def source_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse ``props`` once into VARIANT, extract ``$.k`` typed, and
    profile it: per k-decade (k DIV 10), event count, distinct event
    types, and the exact k sum. Distinct from events_json_extract (which
    string-extracts per reference): this face exercises the parse-once
    binary VARIANT path."""
    ev = load_table(spark, sf_dir, "events")
    v = parse_variant(ev, "props")
    k = F.expr("CAST(variant_get(v, '$.k', 'int') AS BIGINT)")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy(F.expr("k DIV 10").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.expr("CAST(SUM(k) AS BIGINT)").alias("sum_k"),
        )
    )


VARIANT_EXTRACT_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decade,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1
"""


QUERIES = {
    "source_xml_roundtrip": source_xml_roundtrip,
    "source_variant_extract": source_variant_extract,
}

ORACLES = {
    "source_xml_roundtrip": XML_ROUNDTRIP_ORACLE,
    "source_variant_extract": VARIANT_EXTRACT_ORACLE,
}

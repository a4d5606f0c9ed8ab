"""Multimodal columns (north star): image/audio/video as opaque binary
columns + typed metadata, with Pandas-UDF decode plumbing.

The container has no image/audio libraries, so the decode step is a
DETERMINISTIC FAKE (clearly marked below); the Spark-side plumbing — binary
schema, Arrow batching through mapInPandas, partition-preserving shape — is
real and tested. Swap `_fake_decode` for a PIL/ffmpeg call and nothing else
changes.

The synthetic corpus has no binary column, so `documents.text` is encoded to
binary at scan time — the plumbing downstream is identical to reading
`spark.read.format("binaryFile")` blobs.

Scale notes: decode is embarrassingly parallel per-partition Python with
Arrow transfer; budget executor memory for batch_size × max_blob. Metadata
extraction stays fully JVM-side (no Python) — filter/prune on metadata
BEFORE decoding is the whole point of the metadata/payload split at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table


def _with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary payload column + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata extraction over the binary column: size, checksum,
    header bytes, and a magic-byte kind classifier — the filter/prune stage
    that runs BEFORE any expensive decode."""
    blobs = _with_blob(spark, sf_dir)
    first = F.expr("ascii(substring(CAST(blob AS STRING), 1, 1))")
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("blob").alias("content_md5"),
        F.base64(F.expr("CAST(substring(CAST(blob AS STRING), 1, 8) AS BINARY)")).alias("header_b64"),
        F.when(first < 100, "kind_a").when(first < 110, "kind_b").otherwise("kind_c").alias("kind"),
    )


MULTIMODAL_METADATA_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       to_base64(encode(substring(text, 1, 8))) AS header_b64,
       CASE WHEN ascii(substring(text, 1, 1)) < 100 THEN 'kind_a'
            WHEN ascii(substring(text, 1, 1)) < 110 THEN 'kind_b'
            ELSE 'kind_c' END AS kind
FROM documents
"""

_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_intensity double"
)


def _fake_decode(blob: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE image decode (no image libs in this container).

    Stands in for e.g. ``PIL.Image.open(io.BytesIO(blob))``. Produces
    stable pseudo-dimensions from the byte content so tests can assert
    exact values. Replace with a real decoder; the mapInPandas plumbing
    around it is production-shaped.
    """
    if not blob:
        return 0, 0, 0, 0.0
    width = 64 + blob[0] % 64
    height = 64 + blob[-1] % 64
    n_channels = 1 + blob[len(blob) // 2] % 3
    mean_intensity = sum(blob[:256]) / min(len(blob), 256)
    return width, height, n_channels, mean_intensity


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, blob) partitions.
    Because the stand-in decode is a pure function of the bytes and the
    corpus is ASCII, the whole Python path is value-checkable against a
    byte-arithmetic DuckDB oracle — the mapInPandas plumbing (Arrow
    batching, schema, partition shape) gets a hard correctness signal, not
    just a rows-only smoke check. A real PIL/ffmpeg decode would drop back
    to rows-only."""
    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return blobs.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: explode each blob
    into K fixed-offset "frames" (deterministic byte slices), one row per
    frame — the fan-out shape of real frame extraction. JVM-side only."""
    blobs = _with_blob(spark, sf_dir)
    k = 4
    frames = F.array(
        *[
            F.struct(
                F.lit(i).alias("frame_idx"),
                F.expr(
                    f"CAST(substring(CAST(blob AS STRING),"
                    f" 1 + CAST((meta.n_bytes * {i}) / {k} AS INT), 16) AS BINARY)"
                ).alias("frame_bytes"),
            )
            for i in range(k)
        ]
    )
    return (
        blobs.select("doc_id", F.explode(frames).alias("f"))
        .select(
            "doc_id",
            F.col("f.frame_idx").alias("frame_idx"),
            F.md5(F.col("f.frame_bytes")).alias("frame_md5"),
            F.octet_length(F.col("f.frame_bytes")).alias("frame_bytes_len"),
        )
    )


MULTIMODAL_FRAME_ORACLE = """
WITH frames AS (
  SELECT doc_id, f.frame_idx AS frame_idx,
         substring(text, 1 + CAST(trunc(octet_length(encode(text)) * f.frame_idx / 4) AS INT), 16) AS frame_str
  FROM documents, (SELECT unnest([0,1,2,3]) AS frame_idx) f
)
SELECT doc_id, frame_idx, md5(frame_str) AS frame_md5,
       octet_length(encode(frame_str)) AS frame_bytes_len
FROM frames
"""


# Byte-arithmetic replay of _fake_decode: the corpus is ASCII (asserted in
# tests), so byte i of the blob == ascii(substring(text, i+1, 1)). Integer
# modulo and an exact int/int division make every column bit-identical.
MULTIMODAL_DECODE_ORACLE = """
SELECT doc_id,
       64 + ascii(substring(text, 1, 1)) % 64 AS width,
       64 + ascii(substring(text, length(text), 1)) % 64 AS height,
       1 + ascii(substring(text, (length(text) // 2) + 1, 1)) % 3 AS n_channels,
       list_sum(list_transform(range(1, least(length(text), 256) + 1),
                               i -> ascii(substring(text, CAST(i AS INT), 1))))
         / least(length(text), 256) AS mean_intensity
FROM documents
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_metadata": MULTIMODAL_METADATA_ORACLE,
    "multimodal_decode_features": MULTIMODAL_DECODE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_ORACLE,
}

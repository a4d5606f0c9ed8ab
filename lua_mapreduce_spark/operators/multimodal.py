"""Multimodal columns (north star): image/audio/video as opaque binary
columns + typed metadata, with Pandas-UDF decode plumbing.

The container has no image/audio libraries, so the decode path works on a
REAL format a pure-Python parser can handle: each document is rendered as
a valid 24-bit BMP (spec-compliant headers, bottom-up padded rows) and
decoded by reading the actual BITMAPINFOHEADER and pixel array. The
Spark-side plumbing — binary schema, Arrow batching through mapInPandas,
partition-preserving shape — is the production shape; swapping
`_decode_bmp` for PIL/ffmpeg changes nothing around it.

The synthetic corpus has no binary column, so `documents.text` is encoded to
binary at scan time — the plumbing downstream is identical to reading
`spark.read.format("binaryFile")` blobs.

Scale notes: decode is embarrassingly parallel per-partition Python with
Arrow transfer; budget executor memory for batch_size × max_blob. Metadata
extraction stays fully JVM-side (no Python) — filter/prune on metadata
BEFORE decoding is the whole point of the metadata/payload split at 100 TB.
"""

from __future__ import annotations

import struct
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


def _encode_bmp(text_bytes: bytes) -> bytes:
    """Render a document's bytes as a REAL 24-bit uncompressed BMP:
    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, rows padded to
    4-byte boundaries per the format spec. Dimensions and pixel bytes are
    deterministic functions of the text (width from length, height from the
    first byte, pixel j = text byte j mod n) so the decode output is
    byte-arithmetically replayable in SQL. The output is a valid .bmp any
    viewer opens."""
    n = len(text_bytes)
    width = 4 + n % 13
    height = 3 + text_bytes[0] % 7
    row_raw = width * 3
    pad = (-row_raw) % 4
    size_image = (row_raw + pad) * height
    header = b"BM" + struct.pack("<IHHI", 54 + size_image, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, size_image, 2835, 2835, 0, 0
    )
    px = bytearray()
    j = 0
    for _ in range(height):
        for _ in range(row_raw):
            px.append(text_bytes[j % n])
            j += 1
        px.extend(b"\x00" * pad)
    return header + info + bytes(px)


def _decode_bmp(blob: bytes) -> tuple[int, int, int, float]:
    """Pure-Python BMP decode (the container has no PIL/ffmpeg): validates
    the magic, reads width/height/bit-count from the BITMAPINFOHEADER, and
    computes the mean pixel value by walking the actual pixel array,
    skipping row padding. Exact integer sum / integer count keeps the
    double bit-identical to the SQL replay."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bit_count,) = struct.unpack_from("<H", blob, 28)
    if bit_count % 8:
        raise ValueError(f"unsupported bit count {bit_count}")
    n_channels = bit_count // 8
    row_raw = width * n_channels
    pad = (-row_raw) % 4
    total = 0
    pos = off
    for _ in range(height):
        total += sum(blob[pos : pos + row_raw])
        pos += row_raw + pad
    n_px_bytes = width * height * n_channels
    return width, height, n_channels, total / n_px_bytes


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched real-format decode: each document is materialized as a
    valid 24bpp BMP and parsed back by a pure-Python header+pixel-array
    decoder inside ONE mapInPandas pass (encode exists only because the
    corpus ships no binary column; a real corpus starts at the decode).
    The BMP construction is a deterministic function of the text and the
    corpus is ASCII (asserted in tests), so the decoded features are
    value-checkable against a byte-arithmetic DuckDB oracle — the Arrow
    batching, schema, and the decoder itself all get a hard correctness
    signal. A PIL/ffmpeg decode of opaque blobs would drop to rows-only."""
    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bmp(_encode_bmp(b)) for b in pdf["blob"]]
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


# Byte-arithmetic replay of the BMP round-trip: the corpus is ASCII and
# non-empty (asserted in tests), so byte j of the blob ==
# ascii(substring(text, j+1, 1)); the BMP construction pins width/height
# from (length, first byte) and pixel j = text byte j mod n, so the decoded
# mean is an exact integer sum over w*h*3 pixel bytes divided by the same
# integer count — bit-identical across engines.
MULTIMODAL_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         CAST(4 + octet_length(encode(text)) % 13 AS INT) AS width,
         CAST(3 + ascii(substring(text, 1, 1)) % 7 AS INT) AS height
  FROM documents)
SELECT doc_id, width, height, CAST(3 AS INT) AS n_channels,
       CAST(list_sum(list_transform(range(0, width * height * 3),
                j -> ascii(substring(text, CAST(j % n AS INT) + 1, 1)))) AS DOUBLE)
         / (width * height * 3) AS mean_intensity
FROM dims
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

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


_THUMB_W = 8
_THUMB_H = 8


def _resize_nn(blob: bytes) -> tuple[int, int, float]:
    """Nearest-neighbor thumbnail of a decoded BMP: for output pixel (x, y)
    sample source pixel (x*w//OUT_W, y*h//OUT_H) — the standard NN index
    map, all-integer, so the sampled-byte mean replays exactly in SQL.
    Walks the RAW pixel array (no row padding at raw index level)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    row_stride = width * 3 + ((-width * 3) % 4)
    total = 0
    for y in range(_THUMB_H):
        sy = y * height // _THUMB_H
        for x in range(_THUMB_W):
            sx = x * width // _THUMB_W
            base = off + sy * row_stride + sx * 3
            total += blob[base] + blob[base + 1] + blob[base + 2]
    return _THUMB_W, _THUMB_H, total / (_THUMB_W * _THUMB_H * 3)


def multimodal_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize in one Arrow-batched pass — the
    feature-extraction shape for embedding-model preprocessing (decode,
    resize to model input size, hand off). Same real-BMP payload and the
    same byte-arithmetic oracle idea as multimodal_decode_features, so the
    resize index math gets a hard value-level signal too."""
    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_resize_nn(_encode_bmp(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": [o[0] for o in out],
                    "out_height": [o[1] for o in out],
                    "thumb_mean": [o[2] for o in out],
                }
            )

    return blobs.mapInPandas(
        resize_batches, schema="doc_id long, out_width int, out_height int, thumb_mean double"
    )


# Replay: the raw pixel byte at (sy, sx, c) is text byte
# (sy*width*3 + sx*3 + c) mod n (construction order, padding lives outside
# raw indices); NN sampling indexes are all-integer, so the 192-byte sum is
# exact and the single division bit-matches.
MULTIMODAL_RESIZE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         CAST(4 + octet_length(encode(text)) % 13 AS INT) AS width,
         CAST(3 + ascii(substring(text, 1, 1)) % 7 AS INT) AS height
  FROM documents)
SELECT doc_id,
       CAST({_THUMB_W} AS INT) AS out_width,
       CAST({_THUMB_H} AS INT) AS out_height,
       CAST(list_sum(list_transform(range(0, {_THUMB_W * _THUMB_H * 3}),
         i -> ascii(substring(text,
           CAST((((((i // {_THUMB_W * 3}) * height) // {_THUMB_H}) * width * 3
                  + ((((i % {_THUMB_W * 3}) // 3) * width) // {_THUMB_W}) * 3
                  + i % 3) % n) AS INT) + 1, 1)))) AS DOUBLE)
         / {_THUMB_W * _THUMB_H * 3} AS thumb_mean
FROM dims
"""


def _encode_wav(text_bytes: bytes) -> bytes:
    """Render a document's bytes as a REAL 8-bit mono PCM WAV (RIFF +
    fmt + data chunks per the spec; stdlib `wave` opens it). Sample rate
    derives from the first byte, samples ARE the text bytes — so decoded
    audio features replay in SQL, like the BMP path."""
    n = len(text_bytes)
    sample_rate = 8000 + (text_bytes[0] % 8) * 1000
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    data_hdr = b"data" + struct.pack("<I", n)
    riff_size = 4 + (8 + len(fmt)) + (8 + n)
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + data_hdr
        + text_bytes
    )


def _decode_wav(blob: bytes) -> tuple[int, int, float, float]:
    """Chunk-walking WAV parse (not fixed offsets — real files interleave
    LIST/fact chunks): find fmt for the sample rate, data for the samples;
    return (sample_rate, n_samples, duration_ms, mean_amplitude)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            sample_rate = struct.unpack_from("<I", body, 4)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data)
    return sample_rate, n, (n * 1000) / sample_rate, sum(data) / n


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality twin of the BMP decode: real WAV payloads parsed by a
    chunk-walking pure-Python decoder in one mapInPandas pass, emitting the
    features an audio curation pipeline filters on (rate, length, loudness
    proxy). Value-checked end-to-end via byte arithmetic."""
    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_decode_wav(_encode_wav(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [o[0] for o in out],
                    "n_samples": [o[1] for o in out],
                    "duration_ms": [o[2] for o in out],
                    "mean_amplitude": [o[3] for o in out],
                }
            )

    return blobs.mapInPandas(
        decode_batches,
        schema="doc_id long, sample_rate int, n_samples int, duration_ms double,"
        " mean_amplitude double",
    )


MULTIMODAL_AUDIO_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         8000 + (ascii(substring(text, 1, 1)) % 8) * 1000 AS sample_rate
  FROM documents)
SELECT doc_id,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       CAST(n * 1000 AS DOUBLE) / sample_rate AS duration_ms,
       CAST(list_sum(list_transform(range(0, n),
              j -> ascii(substring(text, CAST(j AS INT) + 1, 1)))) AS DOUBLE)
         / n AS mean_amplitude
FROM base
"""


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


def _phash_bits(blob: bytes) -> str:
    """64-bit average hash (aHash) of the 8x8 NN thumbnail as a '0'/'1'
    string: bit i set when thumbnail pixel i's channel-sum exceeds the
    thumbnail mean. The comparison is s_i * 64 > total (pure integers) so
    the bit decisions replay exactly in SQL; the hash is emitted as a
    bitstring, not a BIGINT, because bit 63 would need unsigned shifts
    that DuckDB and Spark overflow differently."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    row_stride = width * 3 + ((-width * 3) % 4)
    sums = []
    for i in range(_THUMB_W * _THUMB_H):
        sy = (i // _THUMB_W) * height // _THUMB_H
        sx = (i % _THUMB_W) * width // _THUMB_W
        base = off + sy * row_stride + sx * 3
        sums.append(blob[base] + blob[base + 1] + blob[base + 2])
    total = sum(sums)
    return "".join("1" if s * len(sums) > total else "0" for s in sums)


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: decode each BMP payload, aHash its 8x8
    thumbnail inside the same Arrow-batched pass, then mark duplicate
    images JVM-side by counting per 64-bit hash — the image twin of
    dedup_exact (identical pixels hash equal; near-identical renders
    collide too, which is the point of a perceptual hash). Output is the
    per-image verdict (hash, bucket size, dup flag) so the result carries
    signal even on a dup-free corpus slice. Scale shape: one mapInPandas
    decode pass, then a window count on a 64-char key; no pixel data ever
    reaches a shuffle."""
    from pyspark.sql import Window

    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [_phash_bits(_encode_bmp(b)) for b in pdf["blob"]],
                }
            )

    hashes = blobs.mapInPandas(phash_batches, schema="doc_id long, phash string")
    n_same = F.count(F.lit(1)).over(Window.partitionBy("phash"))
    return hashes.select(
        "doc_id",
        "phash",
        n_same.alias("n_same_hash"),
        (n_same > 1).alias("is_dup"),
    )


# Replay: raw pixel byte (sy, sx, c) = text byte (sy*width*3 + sx*3 + c)
# mod n (same index map as the resize oracle); per-thumb-pixel triplet
# sums s_i, bit i = s_i * 64 > sum(s).
_PHASH_PIXSUM = f"""list_transform(range(0, {_THUMB_W * _THUMB_H}), i ->
  ascii(substring(text, CAST(((((i // {_THUMB_W}) * height) // {_THUMB_H}) * width * 3
        + (((i % {_THUMB_W}) * width) // {_THUMB_W}) * 3) % n AS INT) + 1, 1))
+ ascii(substring(text, CAST(((((i // {_THUMB_W}) * height) // {_THUMB_H}) * width * 3
        + (((i % {_THUMB_W}) * width) // {_THUMB_W}) * 3 + 1) % n AS INT) + 1, 1))
+ ascii(substring(text, CAST(((((i // {_THUMB_W}) * height) // {_THUMB_H}) * width * 3
        + (((i % {_THUMB_W}) * width) // {_THUMB_W}) * 3 + 2) % n AS INT) + 1, 1)))"""

MULTIMODAL_PHASH_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         CAST(4 + octet_length(encode(text)) % 13 AS INT) AS width,
         CAST(3 + ascii(substring(text, 1, 1)) % 7 AS INT) AS height
  FROM documents),
sums AS (
  SELECT doc_id, {_PHASH_PIXSUM} AS s FROM dims),
hashed AS (
  SELECT doc_id,
         array_to_string(list_transform(s, v ->
           CASE WHEN v * {_THUMB_W * _THUMB_H} > list_sum(s)
                THEN '1' ELSE '0' END), '') AS phash
  FROM sums)
SELECT doc_id, phash,
       COUNT(*) OVER (PARTITION BY phash) AS n_same_hash,
       COUNT(*) OVER (PARTITION BY phash) > 1 AS is_dup
FROM hashed
"""


# --------------------------------------------------------------------------
# Scene-cut detection over frame-sampled "video" payloads
# --------------------------------------------------------------------------
#
# Frame differencing — the standard first-pass shot-boundary detector:
# sample K frames at fixed offsets, compute a per-frame photometric
# statistic, flag frames whose statistic jumps by more than a threshold
# versus the previous frame. Per the module convention, the DECODE is the
# deterministic byte-arithmetic stand-in (a real pipeline swaps in ffmpeg
# frame extraction + luma histograms; the Spark plumbing — fixed-offset
# slicing, per-frame integer features, adjacent-frame deltas, cut flags —
# is exactly the production shape). Everything is JVM-side integer
# arithmetic built in ONE projection: the per-frame intensities live in an
# array, deltas index the same array (arr[i] - arr[i-1]), so the whole
# operator is map-side with ZERO shuffles — no per-frame window sort.

_SC_FRAMES = 8  # frames sampled per payload
_SC_PROBE = 16  # bytes sampled per frame (stride 2)
_SC_WIN = 32  # frame slice width (bytes)
_SC_THRESH = 40  # |delta| above this = cut


def _sc_intensity(text_col: str, i: int, div: str = "DIV") -> str:
    """Engine-shared SQL: integer intensity of frame ``i`` — the sum of
    _SC_PROBE sampled byte values inside the frame's _SC_WIN-byte slice at
    offset n*i DIV K. ascii/substr/length behave identically in Spark and
    DuckDB on this ASCII payload; the offset uses integer division
    (``div`` = DIV / //) because CAST(double AS INT) truncates in Spark
    but ROUNDS in DuckDB."""
    start = f"1 + (length({text_col}) * {i}) {div} {_SC_FRAMES}"
    probes = " + ".join(
        f"ascii(substr(substr({text_col}, {start}, {_SC_WIN}), {1 + 2 * j}, 1))"
        for j in range(_SC_PROBE)
    )
    return f"({probes})"


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_idx, intensity, delta, is_cut) per frame TRANSITION
    (frames 1..K-1; frame 0 has no predecessor). Null-free by design: a
    nullable delta/flag column stringifies differently through the
    external driver's pandas canonicalizer (NaN vs None) even when every
    value matches."""
    blobs = _with_blob(spark, sf_dir)
    arr = ", ".join(
        _sc_intensity("CAST(blob AS STRING)", i) for i in range(_SC_FRAMES)
    )
    frames = (
        f"transform(sequence(1, {_SC_FRAMES - 1}), i -> struct("
        f" i AS frame_idx,"
        f" a[i] AS intensity,"
        f" a[i] - a[i-1] AS delta))"
    )
    return (
        blobs.select("doc_id", F.expr(f"array({arr})").alias("a"))
        .select("doc_id", F.explode(F.expr(frames)).alias("f"))
        .select(
            "doc_id",
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.intensity").alias("intensity"),
            F.col("f.delta").alias("delta"),
            (F.abs(F.col("f.delta")) > _SC_THRESH).alias("is_cut"),
        )
    )


def _scene_cuts_oracle() -> str:
    arr = ", ".join(_sc_intensity("text", i, "//") for i in range(_SC_FRAMES))
    idx = ", ".join(str(i) for i in range(1, _SC_FRAMES))
    return f"""
WITH feat AS (SELECT doc_id, [{arr}] AS a FROM documents),
f AS (SELECT doc_id, unnest([{idx}]) AS frame_idx, a FROM feat)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(a[frame_idx + 1] AS INT) AS intensity,
       CAST(a[frame_idx + 1] - a[frame_idx] AS INT) AS delta,
       abs(a[frame_idx + 1] - a[frame_idx]) > {_SC_THRESH} AS is_cut
FROM f
"""


# --------------------------------------------------------------------------
# Audio activity segmentation (VAD-style silence splitting)
# --------------------------------------------------------------------------

_VAD_W = 32  # frame width, samples
_VAD_TH = 94  # per-sample activity threshold (corpus byte mean ~94.5:
# picked so frames split into a real active/silent mix — ~2.7 segments
# per document with both states present at every SF, verified sf0.001
# and sf0.01; 100 leaves <1% of frames active, 92 leaves 88%)


def _vad_segments(blob: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, n_frames, n_active, n_segments, longest_run): frame
    the WAV's data chunk into _VAD_W-sample windows (full frames only), a
    frame is ACTIVE iff its energy (sample sum) >= W * threshold, then
    run-length the active mask — the same chunk-walking parse as
    _decode_wav, so LIST/fact chunks in real files don't break it."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            sample_rate = struct.unpack_from("<I", body, 4)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_frames = len(data) // _VAD_W
    n_active = n_segments = longest = run = 0
    for f in range(n_frames):
        frame = data[f * _VAD_W : (f + 1) * _VAD_W]
        if sum(frame) >= _VAD_W * _VAD_TH:
            n_active += 1
            run += 1
            if run == 1:
                n_segments += 1
            longest = max(longest, run)
        else:
            run = 0
    return sample_rate, n_frames, n_active, n_segments, longest


def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style activity segmentation over the audio modality: split
    each WAV into fixed-width frames, threshold frame energy, and
    run-length the active mask into speech-like segments — the
    silence-splitting pass a speech training pipeline runs to cut long
    recordings into utterances before transcription/alignment. Emits the
    per-document segmentation profile (frame counts, segment count,
    longest run, active milliseconds on the real sample rate).

    Scale shape: one mapInPandas pass, embarrassingly parallel — the
    whole segmentation happens inside the decode batch (per-document
    state never crosses rows), so there is NO shuffle at all; the oracle
    replays frame energies from byte arithmetic and re-derives the
    segments with the SQL gaps-and-islands idiom (f - row_number() run
    groups), proving the imperative run-length loop == the declarative
    form."""
    blobs = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_vad_segments(_encode_wav(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [o[0] for o in out],
                    "n_frames": [o[1] for o in out],
                    "n_active": [o[2] for o in out],
                    "n_segments": [o[3] for o in out],
                    "longest_run": [o[4] for o in out],
                    "active_ms": [
                        o[2] * _VAD_W * 1000 // o[0] for o in out
                    ],
                }
            )

    return blobs.mapInPandas(
        vad_batches,
        schema="doc_id long, sample_rate long, n_frames long, n_active long,"
        " n_segments long, longest_run long, active_ms long",
    )


MULTIMODAL_VAD_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         8000 + (ascii(substring(text, 1, 1)) % 8) * 1000 AS sample_rate
  FROM documents),
frames AS (
  SELECT b.doc_id, t.f,
         CAST(list_sum(list_transform(range({_VAD_W}),
              k -> ascii(substring(b.text,
                         CAST(t.f * {_VAD_W} + k + 1 AS INT), 1))))
           AS BIGINT) AS e
  FROM base b, UNNEST(range(b.n // {_VAD_W})) AS t(f)),
active AS (
  SELECT doc_id, f,
         f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
  FROM frames WHERE e >= {_VAD_W * _VAD_TH}),
runs AS (
  SELECT doc_id, grp, COUNT(*) AS run_len FROM active GROUP BY 1, 2),
stats AS (
  SELECT doc_id, CAST(SUM(run_len) AS BIGINT) AS n_active,
         COUNT(*) AS n_segments, CAST(MAX(run_len) AS BIGINT) AS longest_run
  FROM runs GROUP BY 1)
SELECT b.doc_id, CAST(b.sample_rate AS BIGINT) AS sample_rate,
       CAST(b.n // {_VAD_W} AS BIGINT) AS n_frames,
       CAST(COALESCE(s.n_active, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(s.longest_run, 0) AS BIGINT) AS longest_run,
       CAST(COALESCE(s.n_active, 0) * {_VAD_W} * 1000 // b.sample_rate
            AS BIGINT) AS active_ms
FROM base b LEFT JOIN stats s USING (doc_id)
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize_thumbnail": multimodal_resize_thumbnail,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "multimodal_audio_vad": multimodal_audio_vad,
}

ORACLES = {
    "multimodal_metadata": MULTIMODAL_METADATA_ORACLE,
    "multimodal_decode_features": MULTIMODAL_DECODE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_ORACLE,
    "multimodal_resize_thumbnail": MULTIMODAL_RESIZE_ORACLE,
    "multimodal_audio_features": MULTIMODAL_AUDIO_ORACLE,
    "multimodal_phash_dedup": MULTIMODAL_PHASH_ORACLE,
    "multimodal_scene_cuts": _scene_cuts_oracle(),
    "multimodal_audio_vad": MULTIMODAL_VAD_ORACLE,
}

"""Multimodal preconditions: the decode oracle replays the Python decode
with byte arithmetic over text, which is only valid while the corpus is
pure ASCII (byte i of the UTF-8 blob == character i of the text)."""

from __future__ import annotations

from lua_mapreduce_spark.catalog import load_table
from tests.conftest import SF_MEDIUM


def test_corpus_is_ascii_and_nonempty(spark):
    docs = load_table(spark, SF_MEDIUM, "documents")
    n_multibyte = docs.filter(
        "octet_length(encode(text, 'UTF-8')) != length(text)"
    ).count()
    assert n_multibyte == 0, (
        "documents contain multi-byte characters: MULTIMODAL_DECODE_ORACLE's "
        "byte/char equivalence no longer holds — demote decode to rows-only"
    )
    # The BMP construction derives height from the first byte and pixels by
    # j mod n: an empty document would divide by zero in Python while the
    # SQL oracle silently produced different values. Pin the precondition
    # like the ASCII one so a future corpus fails loudly here.
    n_empty = docs.filter("text IS NULL OR length(text) = 0").count()
    assert n_empty == 0, (
        "documents contain empty text: the BMP encode/oracle pair requires "
        "non-empty payloads — filter or demote decode to rows-only"
    )


def test_bmp_roundtrip_is_spec_compliant():
    """The encoded payload must be a genuinely valid BMP: correct magic,
    declared file size matching the byte length, pixel-array offset 54,
    rows padded to 4-byte multiples — and the decoder must recover exactly
    the dimensions the construction pinned."""
    import struct

    from lua_mapreduce_spark.operators.multimodal import _decode_bmp, _encode_bmp

    for text in (b"a", b"hello world", b"x" * 1000, bytes(range(32, 127))):
        blob = _encode_bmp(text)
        assert blob[:2] == b"BM"
        (file_size,) = struct.unpack_from("<I", blob, 2)
        assert file_size == len(blob)
        (off,) = struct.unpack_from("<I", blob, 10)
        assert off == 54
        w, h, ch, mean = _decode_bmp(blob)
        assert w == 4 + len(text) % 13
        assert h == 3 + text[0] % 7
        assert ch == 3
        exp = [text[j % len(text)] for j in range(w * h * 3)]
        assert mean == sum(exp) / len(exp)


def test_wav_roundtrip_is_spec_compliant():
    """The audio payload must be a genuinely valid WAV: Python's stdlib
    `wave` reader (an independent implementation) must parse it and agree
    with our chunk-walking decoder on rate, frames, and raw samples."""
    import io
    import wave

    from lua_mapreduce_spark.operators.multimodal import _decode_wav, _encode_wav

    for text in (b"a", b"hello world", b"x" * 1000, bytes(range(32, 127))):
        blob = _encode_wav(text)
        rd = wave.open(io.BytesIO(blob))
        assert rd.getnchannels() == 1
        assert rd.getsampwidth() == 1
        assert rd.readframes(rd.getnframes()) == text
        sample_rate, n, duration_ms, mean = _decode_wav(blob)
        assert sample_rate == rd.getframerate() == 8000 + (text[0] % 8) * 1000
        assert n == rd.getnframes() == len(text)
        assert duration_ms == (len(text) * 1000) / sample_rate
        assert mean == sum(text) / len(text)


def test_resize_thumbnail_is_nearest_neighbor_exact():
    """The thumbnail mean must equal the brute-force NN index map over the
    raw construction bytes — catching any off-by-one in row-stride/padding
    handling (the padded file layout vs raw pixel indices)."""
    from lua_mapreduce_spark.operators.multimodal import (
        _THUMB_H,
        _THUMB_W,
        _encode_bmp,
        _resize_nn,
    )

    for text in (b"a", b"hello world", b"x" * 137, bytes(range(32, 127))):
        w = 4 + len(text) % 13
        h = 3 + text[0] % 7
        total = 0
        for y in range(_THUMB_H):
            for x in range(_THUMB_W):
                sy, sx = (y * h) // _THUMB_H, (x * w) // _THUMB_W
                for c in range(3):
                    total += text[(sy * w * 3 + sx * 3 + c) % len(text)]
        ow, oh, mean = _resize_nn(_encode_bmp(text))
        assert (ow, oh) == (_THUMB_W, _THUMB_H)
        assert mean == total / (_THUMB_W * _THUMB_H * 3)


def test_phash_bits_reference_implementation():
    """_phash_bits must equal a from-scratch aHash over the decoded pixel
    grid: NN-sample the 8x8 thumbnail, channel-sum each pixel, set bit i
    when sum_i * 64 > total. Also: identical payloads hash equal."""
    from lua_mapreduce_spark.operators.multimodal import _encode_bmp, _phash_bits

    for text in (b"hello world", b"x" * 50, bytes(range(33, 97))):
        blob = _encode_bmp(text)
        n = len(text)
        w = 4 + n % 13
        h = 3 + text[0] % 7
        sums = []
        for i in range(64):
            sy = (i // 8) * h // 8
            sx = (i % 8) * w // 8
            base = sy * w * 3 + sx * 3
            sums.append(sum(text[(base + c) % n] for c in range(3)))
        total = sum(sums)
        expect = "".join("1" if s * 64 > total else "0" for s in sums)
        assert _phash_bits(blob) == expect
        assert _phash_bits(_encode_bmp(text)) == _phash_bits(blob)


def test_phash_dedup_covers_exact_text_dups(spark):
    """Identical texts render identical BMPs, so every exact text-dup
    group must land inside some phash group: phash dup coverage >= exact
    dup coverage (perceptual collisions can only merge groups)."""
    from pyspark.sql import functions as F

    from lua_mapreduce_spark.catalog import load_table
    from lua_mapreduce_spark.operators.multimodal import multimodal_phash_dedup
    from tests.conftest import SF_MEDIUM

    docs = load_table(spark, SF_MEDIUM, "documents")
    n_docs = docs.count()
    exact_dup_docs = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.sum("n"))
        .collect()[0][0]
        or 0
    )
    phash_rows = multimodal_phash_dedup(spark, SF_MEDIUM).collect()
    assert len(phash_rows) == n_docs  # verdict covers every image
    phash_dup_docs = sum(1 for r in phash_rows if r.is_dup)
    assert phash_dup_docs >= exact_dup_docs


def test_scene_cuts_flags_are_mixed_and_map_side(spark):
    """Cut flags actually discriminate (both True and False present), the
    per-doc transition count is K-1, and the whole operator compiles to a
    shuffle-free map-side plan (no Exchange: the deltas index one array)."""
    import re as _re

    from lua_mapreduce_spark.operators import QUERIES
    from lua_mapreduce_spark.operators.multimodal import _SC_FRAMES

    df = QUERIES["multimodal_scene_cuts"](spark, SF_MEDIUM)
    rows = df.collect()
    flags = {r.is_cut for r in rows}
    assert flags == {True, False}, f"degenerate cut threshold: {flags}"
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert set(per_doc.values()) == {_SC_FRAMES - 1}
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert not _re.search(r"\(\d+\) Exchange", plan), "scene cuts shuffled"

"""Multimodal preconditions: the decode oracle replays the Python decode
with byte arithmetic over text, which is only valid while the corpus is
pure ASCII (byte i of the UTF-8 blob == character i of the text)."""

from __future__ import annotations

from lua_mapreduce_spark.catalog import load_table
from tests.conftest import SF_MEDIUM


def test_corpus_is_ascii(spark):
    docs = load_table(spark, SF_MEDIUM, "documents")
    n_multibyte = docs.filter(
        "octet_length(encode(text, 'UTF-8')) != length(text)"
    ).count()
    assert n_multibyte == 0, (
        "documents contain multi-byte characters: MULTIMODAL_DECODE_ORACLE's "
        "byte/char equivalence no longer holds — demote decode to rows-only"
    )

"""Portable deterministic text hashing.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are engine-specific, so
cross-checkable hashing goes through md5 (identical everywhere): take the
first 15 hex chars (60 bits — fits signed int64, always positive) and parse
as an integer. Spark: ``conv(substr(md5(x),1,15),16,10)``; DuckDB:
``('0x' || substr(md5(x),1,15))::BIGINT``.

Word tokenization follows the reference semantics (SURVEY.md §2.5.4):
whitespace split (utils/utils.lua:76-85, pattern ``[^\\n%s]+``) then
alphabetic-run extraction + lowercase
(example/word-count-taskfile.lua:118-120). Collapsed here into one step:
extract ``[A-Za-z]+`` runs and lowercase — identical output.
"""

from __future__ import annotations

WORD_RE = "[A-Za-z]+"


def words_expr(col: str) -> str:
    """Spark SQL expression: array of lowercased alphabetic-run tokens."""
    return f"transform(regexp_extract_all({col}, '({WORD_RE})', 1), w -> lower(w))"


def oracle_words_expr(col: str) -> str:
    """DuckDB equivalent of :func:`words_expr`."""
    return f"list_transform(regexp_extract_all({col}, '{WORD_RE}'), w -> lower(w))"


def md5_bigint_expr(expr: str) -> str:
    """Spark SQL: 60-bit positive int64 hash of a string expression."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def oracle_md5_bigint_expr(expr: str) -> str:
    """DuckDB twin of :func:`md5_bigint_expr`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

"""The flagship declarative word count must reproduce the reference's golden
output (FIXTURES.md §1) — same tokenization as example/word-count-taskfile.lua
(whitespace split at utils/utils.lua:76-85, `%a+` extraction + lowercase at
word-count-taskfile.lua:118-120, count at :150-153)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lua_mapreduce_spark.functions.texthash import words_expr
from tests.test_mapreduce_api import FIXTURES, GOLDEN


def test_declarative_wordcount_matches_reference_golden(spark):
    docs = spark.createDataFrame(
        [(name, text) for name, text in FIXTURES.items()], "filename string, text string"
    )
    out = (
        docs.select(F.explode(F.expr(words_expr("text"))).alias("word"))
        .groupBy("word")
        .count()
    )
    assert {(r.word, r["count"]) for r in out.collect()} == set(GOLDEN.items())


def test_entry_smoke(spark):
    """Driver t1 contract: entry(spark) returns rows > 0 with stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0

"""Layer A exposed through the query registry: the reference's MapReduce job
abstraction executing the flagship word count over `documents`, checked
against the same DuckDB oracle as the declarative version.

This proves end-to-end parity of the fidelity API (taskfn/mapfn/reducefn
semantics, SURVEY.md §2.1/§2.5) on real data — the reducefn here is the
reference's actual COUNT-of-value-list (word-count-taskfile.lua:150-153,
`yield(key, #value)`), running holistic over the complete grouped list.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.mapreduce import MapReduceJob
from lua_mapreduce_spark.operators.text import WORDCOUNT_ORACLE

_WORD_RE = re.compile(r"[A-Za-z]+")


def _mapfn(key, text):
    """Reference mapfn semantics (word-count-taskfile.lua:105-144):
    whitespace split, alphabetic-run extract, lowercase, emit (word, 1)."""
    for token in text.split():
        for word in _WORD_RE.findall(token):
            yield word.lower(), 1


def _reducefn(key, values):
    """Reference reducefn (word-count-taskfile.lua:150-153): list length."""
    yield key, len(values)


def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    job = MapReduceJob(source_df=docs, mapfn=_mapfn, reducefn=_reducefn)
    return job.to_dataframe(spark, schema="word string, cnt long")


QUERIES = {"mr_wordcount": mr_wordcount}
ORACLES = {"mr_wordcount": WORDCOUNT_ORACLE}

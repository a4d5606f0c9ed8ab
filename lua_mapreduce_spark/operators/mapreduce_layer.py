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


def _grep_mapfn(key, text):
    """distributed-grep mapfn (the other canonical MapReduce example from
    the Google paper the reference cites, README.md:6): emit the doc's
    source label when the text matches."""
    if "the " in text.lower():
        yield key, 1


def _sum_reducefn(key, values):
    yield key, sum(values)


def mr_grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-A grep: per-source count of documents containing 'the '.
    Exercises a SELECTIVE mapfn (emits 0-or-1 pairs, unlike word count's
    fan-out) and a summing reducefn, with combiner enabled — the map-side
    partial-agg path of MapReduceJob."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    job = MapReduceJob(
        source_df=docs,
        mapfn=_grep_mapfn,
        reducefn=_sum_reducefn,
        combinefn=lambda a, b: a + b,
    )
    return job.to_dataframe(spark, schema="source string, n_matching long")


MR_GREP_ORACLE = """
SELECT source, COUNT(*) AS n_matching
FROM documents
WHERE contains(lower(text), 'the ')
GROUP BY source
"""


QUERIES = {"mr_wordcount": mr_wordcount, "mr_grep_count": mr_grep_count}
ORACLES = {"mr_wordcount": WORDCOUNT_ORACLE, "mr_grep_count": MR_GREP_ORACLE}

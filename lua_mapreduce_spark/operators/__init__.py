"""Operator registry.

``QUERIES``: name -> (spark, sf_dir) -> DataFrame — every implemented
operator from SURVEY.md §2 / §2.4, one entry each.
``ORACLES``: name -> ANSI SQL for DuckDB over the same parquet tables.
Queries without an oracle entry are non-SQL-expressible (driver records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lua_mapreduce_spark.operators import (
    dedup,
    events,
    mapreduce_layer,
    multimodal,
    relational,
    relational2,
    relational3,
    relational4,
    similarity,
    streaming_ops,
    text,
    windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    windows,
    text,
    events,
    dedup,
    similarity,
    multimodal,
    mapreduce_layer,
    streaming_ops,
]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _name in QUERIES:
            raise RuntimeError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLES.update(_mod.ORACLES)

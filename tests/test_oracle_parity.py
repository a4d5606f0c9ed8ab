"""Every registered query must hash-match its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (value-level, stricter than a
hash: it reports WHICH values diverge). Queries without an oracle get a
rows-only sanity check.

sf0.01, not sf0.001: small sums can round identically by luck — the two
float-divergence bugs found during verification only appeared at sf0.01.
"""

from __future__ import annotations

import pytest

from lua_mapreduce_spark.operators import ORACLES, QUERIES
from tests.conftest import SF_MEDIUM
from tests.oracle import compare


_DRIVER_HOSTILE_TYPES = ("array", "map", "struct")


def _assert_driver_hashable_schema(name, df):
    """The external driver canonicalizes results via pandas sort/factorize,
    which cannot hash numpy arrays: a top-level array/map/struct output
    column errors the driver row even when values are correct (round-5
    `text_inverted_index` postings). Serialize complex columns to strings
    (concat_ws / to_json) before returning — this guard makes that class
    fail locally first."""
    for f in df.schema.fields:
        tname = f.dataType.typeName()
        assert tname not in _DRIVER_HOSTILE_TYPES, (
            f"{name}.{f.name} is {f.dataType.simpleString()}: top-level "
            f"complex columns break the driver canonicalizer — serialize "
            f"to string (concat_ws/to_json) like agg_collect_sorted_sets"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_MEDIUM)
    _assert_driver_hashable_schema(name, df)
    if name in ORACLES:
        result = compare(name, df, ORACLES[name], SF_MEDIUM)
        assert result.ok, str(result)
    else:
        assert df.count() >= 0  # rows-only: runs and returns a stable schema

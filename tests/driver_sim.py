"""Simulate the EXTERNAL driver's correctness gate end-to-end.

The driver (unlike tests/oracle.py, which compares typed Python values)
canonicalizes both result sets through pandas: sort columns by name,
``sort_values`` over all columns, then hash the values. Round 5 proved the
two paths differ: a top-level array column passes the local compare but
raises ``TypeError: unhashable type: 'numpy.ndarray'`` inside pandas
``sort_values``/``factorize``. This script replays the pandas path for
every driver-window query so that class of failure is caught locally.

Usage: python tests/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from lua_mapreduce_spark.catalog import TABLES
from lua_mapreduce_spark.operators import ORACLES, QUERIES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _values_hash(df: pd.DataFrame) -> int:
    # factorize-style: stringify every cell post-sort; stable across engines
    # for the types the repo emits (int/float/str/bool/date/timestamp).
    return hash(tuple(tuple(str(v) for v in row) for row in df.itertuples(index=False)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)[:50]

    from lua_mapreduce_spark.session import get_spark

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        try:
            sdf = _canon(QUERIES[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 — the driver records any error
            failures.append((name, f"spark/canon error: {e!r}"))
            print(f"{name}: ERROR {e!r}")
            continue
        if name not in ORACLES:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = _canon(con.sql(ORACLES[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle/canon error: {e!r}"))
            print(f"{name}: ORACLE ERROR {e!r}")
            continue
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        h = rows and schema and _values_hash(sdf) == _values_hash(odf)
        status = "OK" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            failures.append((name, f"rows={rows} schema={schema} hash={h}"))
        print(f"{name}: {status} ({len(sdf)} rows)")

    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

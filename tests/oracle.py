"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, schema width, and order-insensitive values: columns
sorted by name, rows sorted by their full value tuple, exact equality for
non-floats and bitwise-or-tiny-tolerance for floats (we aim for bitwise; the
tolerance only exists to report NEAR-miss vs hard mismatch distinctly).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from lua_mapreduce_spark.catalog import TABLES


def _duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        extra = "" if self.ok else " | " + "; ".join(self.mismatches[:5])
        return f"{self.name}: {status} ({self.spark_rows} rows){extra}"


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = _duckdb_conn(sf_dir)
    try:
        rel = con.sql(oracle_sql)
        oracle_cols = rel.columns
        oracle_rows = rel.fetchall()
    finally:
        con.close()

    res = CompareResult(name, True, len(spark_rows), len(oracle_rows))
    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.mismatches.append(f"columns: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.mismatches.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
        return res

    s_norm = _normalize(spark_rows, spark_cols)
    o_norm = _normalize(oracle_rows, oracle_cols)
    ncols = len(spark_cols)
    for idx, (srow, orow) in enumerate(zip(s_norm, o_norm)):
        for c in range(ncols):
            sv, ov = srow[c], orow[c]
            if sv == ov:
                continue
            if isinstance(sv, float) and isinstance(ov, float):
                if sv == ov:  # bitwise-equal is the goal
                    continue
                rel_err = abs(sv - ov) / max(abs(sv), abs(ov), 1e-300)
                res.ok = False
                res.mismatches.append(
                    f"row {idx} col {sorted(spark_cols)[c]}: spark={sv!r} oracle={ov!r} rel_err={rel_err:.2e}"
                )
            else:
                res.ok = False
                res.mismatches.append(
                    f"row {idx} col {sorted(spark_cols)[c]}: spark={sv!r} ({type(sv).__name__}) "
                    f"oracle={ov!r} ({type(ov).__name__})"
                )
            if len(res.mismatches) >= 10:
                return res
    return res

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


# ---------------------------------------------------------------------------
# Type normalization: the driver's value-hash is TYPED, so a DuckDB HUGEINT
# (int128, e.g. from SUM over INT) hashes differently from Spark's BIGINT even
# when every value is identical — that was the single r01 driver failure.
# Compare normalized dtypes per column so this class fails locally first.
# Calibrated against observed driver behavior in CORRECTNESS_r01: int widths
# up to 64 bits are interchangeable (scalar_functions_showcase passed with
# Spark int32 vs DuckDB int64), and decimal vs double is tolerated
# (agg_histogram_bins passed with Spark double vs DuckDB DECIMAL), but
# HUGEINT/int128 is NOT (agg_null_semantics failed on it — DuckDB's
# dataframe fetch coerces int128 outside the int64 domain).
#
# NOTE: these equivalence classes are EMPIRICAL, not documented driver
# behavior — they encode exactly what the driver's typed value-hash has been
# observed to tolerate. If the driver's hash ever changes (a new
# CORRECTNESS round disagreeing with this suite is the symptom), re-verify
# the classes against that round before trusting local green. Width
# differences INSIDE a family (e.g. a sum narrowing int64 -> int32) are
# therefore invisible here by design; `compare` logs them to stderr so
# genuine Spark-side type regressions stay visible without failing the
# parity gate.
# ---------------------------------------------------------------------------

_INT_WIDTHS = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "hugeint": "int128",
    "utinyint": "int",
    "usmallint": "int",
    "uinteger": "int",
    "ubigint": "uint64",
}


def _norm_type(t: str) -> str:
    """Normalize a Spark simpleString or DuckDB type string to one family."""
    import re

    t = t.strip().lower()
    # duckdb list syntax T[] -> array<T>
    if t.endswith("[]"):
        return f"array<{_norm_type(t[:-2])}>"
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return f"array<{_norm_type(m.group(1))}>"
    if t.startswith(("map", "struct", "row")):
        return t.split("(")[0].split("<")[0]
    m = re.fullmatch(r"decimal\s*\((\d+),\s*(\d+)\)", t)
    if m:
        return "numeric"
    if t in _INT_WIDTHS:
        return _INT_WIDTHS[t]
    if t in ("double", "float64"):
        return "numeric"
    if t in ("float", "real", "float32"):
        return "float32"
    if t in ("string", "varchar", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("bool", "boolean"):
        return "bool"
    if t in ("binary", "blob"):
        return "binary"
    return t


def _spark_types(df) -> dict[str, str]:
    return {f.name: _norm_type(f.dataType.simpleString()) for f in df.schema.fields}


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


_WIDTHS = {"tinyint": 8, "smallint": 16, "int": 32, "integer": 32, "bigint": 64}


def _log_width_drift(name: str, spark_df, rel_types_raw: dict[str, str]) -> None:
    """Within-family int width differences are tolerated by the driver's
    hash (see note above) but logged so a Spark-side narrowing regression
    stays visible."""
    import sys

    for f in spark_df.schema.fields:
        s_raw = f.dataType.simpleString().lower()
        o_raw = rel_types_raw.get(f.name, "")
        sw, ow = _WIDTHS.get(s_raw), _WIDTHS.get(o_raw)
        if sw is not None and ow is not None and sw != ow:
            print(
                f"[oracle-parity] {name}.{f.name}: int width drift "
                f"spark={s_raw} oracle={o_raw} (tolerated, not failed)",
                file=sys.stderr,
            )


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_cols = spark_df.columns
    spark_types = _spark_types(spark_df)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = _duckdb_conn(sf_dir)
    try:
        rel = con.sql(oracle_sql)
        oracle_cols = rel.columns
        oracle_types = {c: _norm_type(str(t)) for c, t in zip(rel.columns, rel.types)}
        oracle_raw = {c: str(t).lower() for c, t in zip(rel.columns, rel.types)}
        oracle_rows = rel.fetchall()
    finally:
        con.close()

    res = CompareResult(name, True, len(spark_rows), len(oracle_rows))
    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.mismatches.append(f"columns: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    _log_width_drift(name, spark_df, rel_types_raw=oracle_raw)
    for c in sorted(spark_cols):
        if spark_types[c] != oracle_types[c]:
            res.ok = False
            res.mismatches.append(
                f"dtype {c}: spark={spark_types[c]} oracle={oracle_types[c]}"
            )
    if not res.ok:
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

"""Order-independent exact aggregation of money-like double columns.

A plain ``SUM(double)`` is order-dependent in IEEE arithmetic: Spark's
partial aggregation over N shuffle partitions and DuckDB's single-node sum
associate differently and disagree in the last bits — results become
nondeterministic across partition counts, a real reproducibility problem at
scale, and value-hash comparison against any oracle breaks.

Casting *computed* doubles (e.g. ``price * (1 - discount)``) to decimal is
also not portable: engines round the binary64 value to decimal differently
at the last digit (Java shortest-repr vs binary-expansion rounding), and the
per-row drift accumulates across millions of rows.

The robust scheme — verified bitwise-identical between Spark and DuckDB:

1. cast RAW columns to decimal: the data's money columns hold exact
   2-decimal values, so the binary64 is within 1e-13 of the grid point and
   every engine rounds it to the same decimal;
2. do ALL arithmetic in the decimal domain (exact, associative);
3. cast the final aggregate to double: with scale <= 6 and totals < 10^15
   the scaled integer is < 2^53, so the conversion is a single
   correctly-rounded operation in every engine.

Precisions are chosen so products never exceed precision 38 (where Spark
would silently reduce scale and round): money(12,2) * rate-complement(4,2)
* rate-complement(4,2) -> DECIMAL(22,6).

The expression strings are engine-shared: the same SQL text runs in Spark
and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "DECIMAL(12,2)"  # prices, balances: |x| < 10^10, 2 decimals
RATE = "DECIMAL(3,2)"  # discounts/taxes in [0, 1), 2 decimals


def dec(col: str, typ: str = MONEY) -> str:
    """Decimal-domain view of a raw money/rate column (engine-shared SQL)."""
    return f"CAST({col} AS {typ})"


def dsum_sql(expr: str, alias: str) -> str:
    """Exact decimal sum of a decimal-domain expression, output as double.
    Same text for Spark and DuckDB."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    """Exact-sum average: decimal numerator, one IEEE division at the end."""
    return f"CAST(SUM({expr}) AS DOUBLE) / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"


def dsum_expr(expr: str, alias: str) -> Column:
    return F.expr(f"CAST(SUM({expr}) AS DOUBLE)").alias(alias)


def davg_expr(expr: str, alias: str) -> Column:
    return F.expr(
        f"CAST(SUM({expr}) AS DOUBLE) / CAST(COUNT({expr}) AS DOUBLE)"
    ).alias(alias)


# Engine-shared revenue expressions over lineitem.
REVENUE = f"{dec('l_extendedprice')} * (1 - {dec('l_discount', RATE)})"
CHARGE = f"{REVENUE} * (1 + {dec('l_tax', RATE)})"

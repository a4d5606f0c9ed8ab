"""Fourth-wave relational coverage: math scalars, sketch aggregates, and
disjunctive-predicate joins (TPC-H Q19 shape).

Math functions are restricted to the IEEE-exact subset (abs/round/floor/
ceil/sqrt/mod/sign/x*x): transcendental libm functions (exp/ln/pow) differ
in the last ulp across runtimes, which breaks bit-exact cross-engine
comparison — and reproducibility across cluster JVM upgrades, which is the
same problem at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import REVENUE, dsum_expr, dsum_sql

# --------------------------------------------------------------------------
# Math scalar functions (exact subset).
# --------------------------------------------------------------------------


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 499 == 0)
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(x - 30000.0).alias("abs_dev"),
        F.round(x, 1).alias("round1"),
        F.floor(x).cast("double").alias("floor_x"),
        F.ceil(x).cast("double").alias("ceil_x"),
        F.sqrt(x).alias("sqrt_x"),
        (x * x).alias("x_squared"),
        F.expr("l_orderkey % 7").alias("mod7"),
        F.signum(x - 30000.0).alias("sign_dev"),
    )


SCALAR_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 30000.0) AS abs_dev,
       ROUND(l_extendedprice, 1) AS round1,
       CAST(FLOOR(l_extendedprice) AS DOUBLE) AS floor_x,
       CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_x,
       SQRT(l_extendedprice) AS sqrt_x,
       l_extendedprice * l_extendedprice AS x_squared,
       l_orderkey % 7 AS mod7,
       CAST(SIGN(l_extendedprice - 30000.0) AS DOUBLE) AS sign_dev
FROM lineitem WHERE l_orderkey % 499 = 0
"""


# --------------------------------------------------------------------------
# Sketch aggregates: HyperLogLog distinct counting. Sketch internals are
# engine-specific, so this is a rows-only check — but the test suite
# asserts the estimate lands within the configured relative error of the
# exact count. At 100 TB approx_count_distinct is THE way to count
# distincts: fixed-size state, one pass, no exact-distinct shuffle blowup.
# --------------------------------------------------------------------------


def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR of conjunctive predicate groups across a join.
# Catalyst extracts the common join key so the OR doesn't force a nested-
# loop join; part broadcasts; non-common predicate parts evaluate post-join.
# --------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return joined.filter(cond).agg(
        dsum_expr(REVENUE, "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_ORACLE = f"""
SELECT {dsum_sql(REVENUE, "revenue")},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Salted join: the manual hot-key mitigation. The fact side gets a
# deterministic salt; the dim side is replicated SALT ways, so one hot join
# key spreads over SALT reducers instead of melting a single task. Results
# are identical to the plain join — the oracle IS the plain join, which is
# the whole point: salting is a physical rewrite, not a semantic one.
# (AQE's skewJoin does this automatically per-partition; the explicit form
# is for engines/joins AQE can't split, and for doc value.)
# --------------------------------------------------------------------------

_SALT = 8


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT))
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_expr(REVENUE, "revenue"),
        )
    )


SALTED_JOIN_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {dsum_sql(REVENUE, "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "scalar_math_funcs": scalar_math_funcs,
    "agg_approx_distinct_sketch": agg_approx_distinct_sketch,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "join_skew_salted": join_skew_salted,
}

ORACLES = {
    "scalar_math_funcs": SCALAR_MATH_ORACLE,
    "q19_disjunctive_revenue": Q19_ORACLE,
    "join_skew_salted": SALTED_JOIN_ORACLE,
}

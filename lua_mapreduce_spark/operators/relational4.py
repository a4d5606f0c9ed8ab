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
from pyspark.sql.window import Window

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import REVENUE, dsum_expr, dsum_sql
from lua_mapreduce_spark.functions.texthash import md5_bigint_expr, oracle_md5_bigint_expr

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
# engine-specific, so the raw estimate can never hash-match a different
# engine — instead the query emits the EXACT values plus a Spark-computed
# `within_rsd` boolean (estimate within 5x the configured rsd of exact),
# and the oracle checks the exact columns and asserts the boolean TRUE.
# The sketch is hash-based and deterministic for a given dataset, so the
# boolean is replayable, and a sketch accuracy regression flips it to
# false -> hash mismatch. At 100 TB approx_count_distinct is THE way to
# count distincts: fixed-size state, one pass, no exact-distinct shuffle
# blowup; the exact countDistinct here exists to make the contract
# checkable at test scale.
# --------------------------------------------------------------------------

_HLL_RSD = 0.02
_HLL_TOL = 5 * _HLL_RSD  # 5-sigma: deterministic sketch, generous margin


def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate per (flag, partkey) FIRST, then derive every face from the
    # deduplicated relation (r16 optimization round — the agg_hll_sketch
    # identity): mixing countDistinct with approx_count_distinct in ONE
    # aggregate makes Spark carry the 410-word HLL++ partial state per
    # DISTINCT (flag, partkey) group through the first exchange (~3.3 KB
    # per distinct key — a sketch-per-key shuffle that scales with the key
    # domain, not the group count). The HLL register MAX is
    # duplicate-insensitive and the hash is a deterministic function of
    # the key, so the sketch over the distinct relation is BIT-IDENTICAL
    # to the sketch over the raw rows; exact_parts is a plain COUNT of
    # the distinct relation and n_rows the SUM of its per-key counts.
    # NOTE: the COUNT-of-distinct-relation == countDistinct identity holds
    # because l_partkey is NOT NULL in TPC-H (countDistinct excludes NULLs;
    # COUNT(*) over the group-by would count a NULL key as one value).
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_returnflag", "l_partkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_key.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=_HLL_RSD).alias("approx_parts"),
        F.count(F.lit(1)).alias("exact_parts"),
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_rows"),
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (rel_err <= F.lit(_HLL_TOL)).alias("within_rsd"),
    )


APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n_rows,
       TRUE AS within_rsd
FROM lineitem GROUP BY l_returnflag
"""


# GK accuracy=1000 guarantees rank error <= n/1000; check with 3x margin.
_GK_ACCURACY = 1000
_GK_EPS = 3.0 / _GK_ACCURACY


def agg_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (Greenwald-Khanna): fixed-size mergeable state vs the
    exact percentile's full sort — the 100 TB quantile path. The estimate
    itself is engine-specific, so the driver-facing output is the exact
    discrete median (the element at rank (n+1) div 2 — an actual data
    value, bitwise-safe) plus `within_rank_error`: the sketch estimate's
    rank lands within 3x the configured 1/accuracy bound of n/2. The
    production path is the one-pass approx_percentile agg alone; the
    window/join here exist to make the sketch contract oracle-checkable."""
    orders = load_table(spark, sf_dir, "orders")

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wn = Window.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("cnt"),
    )
    disc = ranked.filter(
        F.col("rn") == F.expr("(cnt + 1) DIV 2")
    ).select("o_orderstatus", F.col("o_totalprice").alias("p50_disc"))

    approx = orders.groupBy("o_orderstatus").agg(
        F.expr(
            f"approx_percentile(o_totalprice, 0.5, {_GK_ACCURACY})"
        ).alias("p50_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # Rank of the estimate: how many rows sort at-or-below it per group.
    rank_of_approx = (
        orders.join(F.broadcast(approx), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("p50_approx"), 1).otherwise(0)
            ).alias("n_le"),
            F.sum(
                F.when(F.col("o_totalprice") < F.col("p50_approx"), 1).otherwise(0)
            ).alias("n_lt"),
            F.max("n_rows").alias("n_rows"),
        )
    )
    checked = rank_of_approx.select(
        "o_orderstatus",
        "n_rows",
        (
            (F.col("n_lt") <= F.col("n_rows") / 2 + F.lit(_GK_EPS) * F.col("n_rows"))
            & (F.col("n_le") >= F.col("n_rows") / 2 - F.lit(_GK_EPS) * F.col("n_rows"))
        ).alias("within_rank_error"),
    )
    return disc.join(F.broadcast(checked), "o_orderstatus").select(
        "o_orderstatus", "p50_disc", "n_rows", "within_rank_error"
    )


APPROX_PERCENTILE_ORACLE = """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
  FROM orders)
SELECT o_orderstatus, o_totalprice AS p50_disc, cnt AS n_rows,
       TRUE AS within_rank_error
FROM ranked WHERE rn = (cnt + 1) // 2
"""


# --------------------------------------------------------------------------
# Heavy hitters (approximate top-k): distributed weighted Misra-Gries
# (Agarwal et al., "Mergeable Summaries", PODS 2012). Each task keeps at
# most `capacity` counters — fixed state regardless of how many distinct
# keys stream through it — so at 100 TB the sketch pass shuffles at most
# capacity x tasks candidate rows instead of every distinct key, and a
# cheap broadcast-semi-join recount makes the final counts exact. Any key
# with global frequency > N/(capacity+1) is guaranteed to survive the
# merged candidate set (per-task decrements sum to <= N/(capacity+1)), so
# the output equals the exact top-k whenever the k-th frequency clears
# that bound. Part of the §2.4 sketch family (gap-fill beyond the
# reference's surface, like HLL/GK above).
# --------------------------------------------------------------------------

_HH_CAPACITY = 256
_HH_K = 10


def _mg(capacity: int):
    """Factory for the per-task weighted Misra-Gries pass (mapInPandas)."""

    def mg_partial(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            for key, cnt in pdf["key"].value_counts().items():
                counters[int(key)] = counters.get(int(key), 0) + int(cnt)
            if len(counters) > capacity:
                # Batched decrement: subtracting the (size-capacity)-th
                # smallest count from every counter and dropping the
                # non-positive ones collapses that many rounds of classic
                # MG decrements into one O(m log m) step per batch.
                delta = sorted(counters.values())[len(counters) - capacity - 1]
                counters = {k: v - delta for k, v in counters.items() if v > delta}
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    return mg_partial


def heavy_hitters(
    df: DataFrame, key: str, k: int, capacity: int = _HH_CAPACITY
) -> DataFrame:
    """Exact top-k over a sketch-bounded candidate set (int64 keys; hash
    non-integer keys upstream). Returns (key, freq) ordered freq DESC,
    key ASC — a deterministic total order, so ties at the k-th spot are
    stable across engines."""
    partials = df.select(F.col(key).cast("long").alias("key")).mapInPandas(
        _mg(capacity), "key long, est long"
    )
    candidates = (
        partials.groupBy("key").agg(F.sum("est").alias("est")).select("key")
    )
    # Candidate cardinality is bounded by capacity x tasks — a fixed size
    # at any data scale — so pinning the broadcast is safe by construction.
    exact = (
        df.join(
            F.broadcast(candidates.withColumnRenamed("key", key)), key, "left_semi"
        )
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return exact.orderBy(F.col("freq").desc(), key).limit(k)


_FK_CAPACITY = 4096
_FK_PHI_DENOM = 2000  # phi = 1/2000 of total traffic; 1/2000 > 1/(4096+1)


def frequent_keys(
    df: DataFrame, key: str, phi_denom: int = _FK_PHI_DENOM,
    capacity: int = _FK_CAPACITY,
) -> DataFrame:
    """ALL keys with frequency > n/phi_denom, exactly counted — the
    contract the Misra-Gries theorem actually guarantees, correct at ANY
    scale and ANY distribution (unlike top-k, which no bounded sketch can
    answer on flat data: if the k-th frequency sits below n/(capacity+1),
    eviction may drop it — found by the sf0.1 stress drive, where 1500
    near-uniform users make "top-10 by sketch" ill-posed).

    Guarantee chain (mergeable summaries, Agarwal et al., PODS'12): a key
    absent from every per-task MG summary has total frequency
    <= sum_p n_p/(cap+1) = n/(cap+1); truncating the merged summary to the
    top-`capacity` summed estimates keeps every key whose summed estimate
    is positive after the merge decrement, a superset of the phi-heavy
    set whenever phi > 1/(capacity+1) (asserted). The exact semi-join
    recount then removes every false positive, so the output is EXACT."""
    if phi_denom >= capacity + 1:
        raise ValueError("need phi > 1/(capacity+1) for the MG guarantee")
    partials = df.select(F.col(key).cast("long").alias("key")).mapInPandas(
        _mg(capacity), "key long, est long"
    )
    merged = partials.groupBy("key").agg(F.sum("est").alias("est"))
    # Global top-capacity by summed estimate. orderBy().limit() compiles to
    # TakeOrderedAndProject — per-partition top-K heaps merged once — so
    # the truncation never funnels the full candidate union (capacity x
    # tasks rows) through a single-task sort.
    candidates = (
        merged.orderBy(F.desc("est"), F.asc("key")).limit(capacity).select("key")
    )
    # Candidate cardinality is <= capacity GLOBALLY after the merge
    # truncation — a constant at any data scale — so the broadcast pin is
    # safe by construction.
    total = df.select(F.count(F.lit(1)).alias("n_total"))
    exact = (
        df.join(
            F.broadcast(candidates.withColumnRenamed("key", key)), key, "left_semi"
        )
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * phi_denom > F.col("n_total"))
        .select(key, "freq")
        .orderBy(F.col("freq").desc(), key)
    )


def agg_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users exceeding 1/2000 of total event traffic via the merged MG
    sketch + exact recount (see frequent_keys). Exact at every SF (checked
    at sf0.01 AND sf0.1): threshold = n/2000, so sf0.01 keeps all ~150
    users (all > 5 events) and sf0.1 keeps 1478 of 1500 (the > 50-event
    users). The eviction/skew path is exercised by the synthetic-Zipf unit
    tests (tests/test_sketches.py)."""
    events = load_table(spark, sf_dir, "events")
    return frequent_keys(events, "user_id")


HEAVY_HITTERS_ORACLE = f"""
SELECT user_id, count(*) AS freq
FROM events GROUP BY user_id
HAVING count(*) * {_FK_PHI_DENOM} > (SELECT count(*) FROM events)
ORDER BY freq DESC, user_id
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR of conjunctive predicate groups across a join.
# Catalyst extracts the common join key so the OR doesn't force a nested-
# loop join; part grows linearly with SF, so its join strategy is AQE's
# call; non-common predicate parts evaluate post-join.
# --------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
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
# TPC-H Q7 shape: bilateral trade volume between two nations — a 5-way
# join (lineitem |><| orders |><| customer + supplier + nation x2). Join
# order at scale: the two fact joins shuffle on their keys once each;
# nation broadcasts (constant 25 rows). supp_n/cust_n are a constant
# FRACTION (2/25) of linearly-growing tables — still unbounded, so no
# forced broadcast; AQE decides from their runtime size.
# --------------------------------------------------------------------------


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nations = ("NATION_3", "NATION_7")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))

    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    return (
        li.join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum_expr(REVENUE, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {dsum_sql(REVENUE, "revenue")},
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name != n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier nation within one customer
# region, per year. share = one IEEE division of two exact decimal sums per
# year group. nation/region broadcast (constant-size); the filtered
# customer/supplier sub-relations grow linearly with SF, so AQE picks
# their strategy; the lineitem |><| orders shuffle is the only forced
# large exchange.
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    cust_in_region = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region.filter(F.col("r_name") == "REGION_1")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.withColumnRenamed("n_name", "s_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nation")

    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN s_nation = 'NATION_2' THEN {REVENUE}"
                f" ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)"
                f" / CAST(SUM({REVENUE}) AS DOUBLE)"
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n_s.n_name = 'NATION_2' THEN {REVENUE}
                     ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
         / CAST(SUM({REVENUE}) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_c ON c_nationkey = n_c.n_nationkey
JOIN region ON n_c.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
WHERE r_name = 'REGION_1'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q17 shape: revenue from small-quantity orders of one brand —
# correlated AVG subquery decorrelated into a per-part aggregate + join
# (Catalyst's RewriteCorrelatedScalarSubquery, written out). The per-part
# avg relation is keyed like the probe side, so the join shuffles on
# partkey once; the brand-filtered part relation is still linear in SF,
# so AQE picks its join strategy at runtime.
# --------------------------------------------------------------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.expr(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
            " / CAST(COUNT(l_quantity) AS DOUBLE)"
        ).alias("avg_qty")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0"
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_ORACLE = """
WITH ppa AS (
  SELECT l_partkey AS ap_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN ppa ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < 0.5 * avg_qty
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape: high-balance customers with no orders — a scalar
# subquery (global average, 1 row, broadcast by construction) + anti join.
# --------------------------------------------------------------------------


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)"
            " / CAST(COUNT(c_acctbal) AS DOUBLE)"
        ).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").alias(
                "total_bal"
            ),
        )
    )


Q22_ORACLE = """
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(COUNT(c_acctbal) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer, ab
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
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

_SALT = 4


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


# --------------------------------------------------------------------------
# Advanced string scalars — the portable set (both engines agree exactly on
# these; initcap/soundex-style locale-sensitive functions are excluded).
# --------------------------------------------------------------------------


def scalar_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 101 == 0)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.lpad(name, 25, "*").alias("lpadded"),
        F.rpad(name, 25, ".").alias("rpadded"),
        F.translate(name, "Cu0", "Kv_").alias("translated"),
        F.repeat(F.substring(name, 1, 4), 2).alias("repeated"),
        F.reverse(name).alias("reversed"),
        F.regexp_replace(name, "Customer", "Cust").alias("replaced"),
        F.instr(name, "#").alias("hash_pos"),
        F.expr("left(c_name, 8)").alias("left8"),
        F.expr("right(c_name, 4)").alias("right4"),
        F.expr("split_part(c_name, '#', 2)").alias("num_part"),
        F.ascii(name).alias("first_ascii"),
    )


SCALAR_STRING_ADV_ORACLE = """
SELECT c_custkey,
       lpad(c_name, 25, '*') AS lpadded,
       rpad(c_name, 25, '.') AS rpadded,
       translate(c_name, 'Cu0', 'Kv_') AS translated,
       repeat(substring(c_name, 1, 4), 2) AS repeated,
       reverse(c_name) AS reversed,
       replace(c_name, 'Customer', 'Cust') AS replaced,
       CAST(instr(c_name, '#') AS INT) AS hash_pos,
       left(c_name, 8) AS left8,
       right(c_name, 4) AS right4,
       split_part(c_name, '#', 2) AS num_part,
       CAST(ascii(c_name) AS INT) AS first_ascii
FROM customer WHERE c_custkey % 101 = 0
"""


# --------------------------------------------------------------------------
# Array aggregation with deterministic output: collect_set sorted. (Raw
# collect_list order is partition-dependent — never expose it unsorted.)
# --------------------------------------------------------------------------


def agg_collect_sorted_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("l_linestatus"))).alias(
            "statuses"
        ),
        F.concat_ws(
            "|", F.sort_array(F.collect_set(F.col("l_linenumber").cast("string")))
        ).alias("linenumbers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


COLLECT_SETS_ORACLE = """
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses,
       string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), '|'
                  ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenumbers,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Null semantics: null grouping keys group together (SQL standard), COUNT
# skips nulls, null-safe equality. Nulls are synthesized with NULLIF since
# the test tables are fully populated.
# --------------------------------------------------------------------------


def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    nn = F.expr("NULLIF(o_orderstatus, 'O')")
    return (
        orders.withColumn("status_nn", nn)
        .groupBy("status_nn")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("status_nn").alias("n_nonnull"),
            F.sum(
                F.when(F.expr("status_nn <=> NULL"), 1).otherwise(0)
            ).alias("n_nullsafe_eq_null"),
        )
    )


NULL_SEMANTICS_ORACLE = """
SELECT NULLIF(o_orderstatus, 'O') AS status_nn,
       COUNT(*) AS n_rows,
       COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null
FROM orders
GROUP BY NULLIF(o_orderstatus, 'O')
"""


# --------------------------------------------------------------------------
# Deterministic sampling: hash-mod instead of TABLESAMPLE/rand(). Seeded
# random sampling is engine- and partitioning-dependent; hashing the key is
# reproducible everywhere, stable under repartitioning, and consistent
# across runs — the only sane way to sample a 100 TB table for a dev loop
# or an A/B split. 5% = hash % 20 == 0.
# --------------------------------------------------------------------------


def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = md5_bigint_expr("CAST(o_orderkey AS STRING)")
    return orders.filter(F.expr(f"({h}) % 20 = 0")).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice")
    )


SAMPLE_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
FROM orders
WHERE ({oracle_md5_bigint_expr("CAST(o_orderkey AS VARCHAR)")}) % 20 = 0
"""


# --------------------------------------------------------------------------
# Custom UDAF via applyInPandas: per-group pandas computation — the batch
# analogue of the reference's holistic reducefn (full value list per key,
# lua-mapreduce-client.lua:188-213). Arrow moves each group as columnar
# batches; at scale budget executor memory for the largest group (same
# constraint the reference had, but per-executor instead of per-server).
# Oracle-checked: pandas' interpolated median == DuckDB quantile_cont(0.5).
# --------------------------------------------------------------------------


def udaf_group_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [len(pdf)],
                "median_price": [pdf["o_totalprice"].median()],
            }
        )

    return orders.groupBy("o_orderpriority").applyInPandas(
        stats, "o_orderpriority string, n long, median_price double"
    )


UDAF_MEDIAN_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       quantile_cont(o_totalprice, 0.5) AS median_price
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Histogram binning: fixed-width buckets computed with arithmetic (portable;
# width_bucket exists in Spark but not everywhere). One map-side projection
# + one tiny agg — the at-scale histogram recipe.
# --------------------------------------------------------------------------


def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bin_w = 50_000.0
    bin_expr = F.floor(F.col("o_totalprice") / F.lit(bin_w)).cast("int")
    return (
        orders.groupBy(bin_expr.alias("bin_idx"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("bin_low", (F.col("bin_idx") * bin_w))
        .withColumn("bin_high", ((F.col("bin_idx") + 1) * bin_w))
    )


HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS bin_idx,
       COUNT(*) AS n_orders,
       CAST(FLOOR(o_totalprice / 50000.0) AS INT) * 50000.0 AS bin_low,
       (CAST(FLOOR(o_totalprice / 50000.0) AS INT) + 1) * 50000.0 AS bin_high
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Upsert (SCD-1 merge) + change audit over immutable parquet: full outer
# join of base vs updates, COALESCE picks the new value, change flags
# classify insert/update/unchanged. This is the snapshot-merge pattern for
# formats without MERGE INTO; one shuffle on the merge key. The updates
# side here is derived deterministically (high-balance customers get a
# bonus) so the whole merge is oracle-checkable.
# --------------------------------------------------------------------------


def upsert_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = (
        base.filter(F.col("c_acctbal") > 9000.0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("u_acctbal"),
        )
    )
    merged = base.alias("b").join(
        updates.alias("u"), F.col("b.c_custkey") == F.col("u.c_custkey"), "full"
    )
    return merged.select(
        F.coalesce(F.col("b.c_custkey"), F.col("u.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.u_acctbal"), F.col("b.c_acctbal")).alias("acctbal"),
        F.when(F.col("b.c_custkey").isNull(), "insert")
        .when(F.col("u.c_custkey").isNull(), "unchanged")
        .otherwise("update")
        .alias("change_kind"),
    )


UPSERT_ORACLE = """
WITH updates AS (
  SELECT c_custkey, c_acctbal + 100.0 AS u_acctbal
  FROM customer WHERE c_acctbal > 9000.0)
SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
       COALESCE(u.u_acctbal, b.c_acctbal) AS acctbal,
       CASE WHEN b.c_custkey IS NULL THEN 'insert'
            WHEN u.c_custkey IS NULL THEN 'unchanged'
            ELSE 'update' END AS change_kind
FROM customer b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
"""


# --------------------------------------------------------------------------
# Higher-order array functions: filter / exists / forall / aggregate /
# zip_with over arrays built from the token stream — all JVM-side lambda
# evaluation, zero Python, zero explode (the array never leaves the row).
# --------------------------------------------------------------------------


def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return docs.select(
        "doc_id",
        F.expr("transform(split(text, ' '), w -> length(w))").alias("_lens"),
    ).select(
        "doc_id",
        F.expr("size(filter(_lens, x -> x > 4))").alias("n_long_words"),
        F.expr("exists(_lens, x -> x > 10)").alias("has_very_long"),
        F.expr("forall(_lens, x -> x < 50)").alias("all_reasonable"),
        F.expr("aggregate(_lens, 0, (acc, x) -> acc + x)").alias("total_chars"),
        F.expr(
            "aggregate(zip_with(_lens, reverse(_lens), (a, b) -> a * b),"
            " 0, (acc, x) -> acc + x)"
        ).alias("palindromic_dot"),
    )


HOF_ORACLE = """
WITH lens AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> length(w)) AS l
  FROM documents WHERE doc_id % 25 = 0)
SELECT doc_id,
       CAST(len(list_filter(l, x -> x > 4)) AS INT) AS n_long_words,
       len(list_filter(l, x -> x > 10)) > 0 AS has_very_long,
       len(list_filter(l, x -> x >= 50)) = 0 AS all_reasonable,
       CAST(list_sum(l) AS INT) AS total_chars,
       CAST(list_sum(list_transform(range(1, len(l) + 1),
                     i -> l[i] * l[len(l) - i + 1])) AS INT) AS palindromic_dot
FROM lens
"""


# --------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of orders-per-customer. LEFT join keeps
# zero-order customers; two shuffles (custkey count, then count-of-counts —
# the second input is |customers| rows, the output ~dozens).
# --------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Regex predicates & extraction (RE2-safe subset — no backrefs/lookaround,
# so the same pattern text runs on Spark's java.util.regex and DuckDB's
# RE2 with identical semantics).
# --------------------------------------------------------------------------


def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 40 == 0)
    return docs.select(
        "doc_id",
        F.col("text").rlike("[A-Z][a-z]+ing\\b").alias("has_ing_word"),
        F.col("text").like("%the%").alias("like_the"),
        F.col("text").ilike("%THE%").alias("ilike_the"),
        F.regexp_extract("text", "([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.expr("regexp_extract_all(text, '([A-Za-z]{7,})', 1)")).alias(
            "n_long_words"
        ),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


SCALAR_REGEX_ORACLE = r"""
SELECT doc_id,
       regexp_matches(text, '[A-Z][a-z]+ing\b') AS has_ing_word,
       text LIKE '%the%' AS like_the,
       text ILIKE '%THE%' AS ilike_the,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       CAST(len(regexp_extract_all(text, '[A-Za-z]{7,}')) AS INT) AS n_long_words,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
FROM documents WHERE doc_id % 40 = 0
"""


# --------------------------------------------------------------------------
# Timestamp arithmetic: diffs, truncation, epoch math — the integer-exact
# subset (no months_between: its fractional-day semantics differ between
# engines).
# --------------------------------------------------------------------------


def scalar_timestamp_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 151 == 0)
    anchor = F.lit("1998-01-01").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.datediff(anchor, F.col("o_orderdate")).alias("days_to_anchor"),
        (F.unix_timestamp(anchor) - F.unix_timestamp("o_orderdate")).alias(
            "secs_to_anchor"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
    )


SCALAR_TSDIFF_ORACLE = """
SELECT o_orderkey,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS INT) AS days_to_anchor,
       CAST(date_diff('second', o_orderdate, TIMESTAMP '1998-01-01') AS BIGINT) AS secs_to_anchor,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start
FROM orders WHERE o_orderkey % 151 = 0
"""


# --------------------------------------------------------------------------
# Map-typed higher-order functions: build a word->count map per doc, then
# filter/transform it — all in-row, no explode. Output is rendered as a
# sorted entry string because map iteration order is undefined in every
# engine (never compare raw maps).
# --------------------------------------------------------------------------


def scalar_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return docs.select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')),"
            " w -> struct(w AS k, size(filter(split(text, ' '), x -> x = w)) AS v))"
        ).alias("_entries"),
    ).select(
        "doc_id",
        F.expr("size(map_from_entries(_entries))").alias("n_distinct_words"),
        F.concat_ws(
            ",",
            F.sort_array(
                F.expr(
                    "transform(filter(_entries, e -> e.v >= 2),"
                    " e -> concat(e.k, ':', CAST(e.v AS STRING)))"
                )
            ),
        ).alias("repeated_words"),
        F.expr(
            "aggregate(map_values(map_from_entries(_entries)), 0, (acc, x) -> acc + x)"
        ).alias("n_total_words"),
    )


MAP_HOF_ORACLE = """
WITH e AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
           w -> struct_pack(k := w,
                v := len(list_filter(string_split(text, ' '), x -> x = w)))) AS entries
  FROM documents WHERE doc_id % 50 = 0)
SELECT doc_id,
       CAST(len(entries) AS INT) AS n_distinct_words,
       COALESCE(list_aggregate(list_sort(list_transform(
           list_filter(entries, x -> x.v >= 2),
           x -> x.k || ':' || CAST(x.v AS VARCHAR))), 'string_agg', ','), '') AS repeated_words,
       CAST(list_sum(list_transform(entries, x -> x.v)) AS INT) AS n_total_words
FROM e
"""


# --------------------------------------------------------------------------
# S4 starts/ends predicates + S6 debug stringification. The reference ships
# string.starts/string.ends (utils.lua:93-105) and table.tostring
# (utils.lua:21-68); Spark's startswith/endswith are scan-pushable
# predicates (StringStartsWith reaches the parquet reader) and to_json is
# the structured-debug equivalent — all JVM-side, zero Python.
# --------------------------------------------------------------------------


def scalar_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    starts = F.col("c_name").startswith("Customer#00000001")
    ends = F.col("c_mktsegment").endswith("ING")
    return (
        c.filter(starts | ends)
        .select(
            "c_custkey",
            starts.alias("name_starts"),
            ends.alias("seg_ends"),
            F.to_json(
                F.struct(
                    F.col("c_custkey").alias("k"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ).alias("as_json"),
        )
    )


STRING_PREDICATES_ORACLE = """
SELECT c_custkey,
       starts_with(c_name, 'Customer#00000001') AS name_starts,
       ends_with(c_mktsegment, 'ING') AS seg_ends,
       CAST(to_json(struct_pack(k := c_custkey, seg := c_mktsegment)) AS VARCHAR) AS as_json
FROM customer
WHERE starts_with(c_name, 'Customer#00000001') OR ends_with(c_mktsegment, 'ING')
"""


# --------------------------------------------------------------------------
# Bitwise scalars: integer-exact in every engine, so fully oracle-checkable.
# DuckDB's ^ is exponentiation, so the oracle spells xor(a, b).
# --------------------------------------------------------------------------


def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.selectExpr(
        "o_orderkey",
        "o_orderkey & 255 AS band",
        "o_orderkey | 4096 AS bor",
        "o_orderkey ^ 85 AS bxor",
        "~o_orderkey AS bnot",
        "shiftleft(o_orderkey, 3) AS shl",
        "shiftright(o_orderkey, 2) AS shr",
        "bit_count(o_orderkey) AS popcount",
    )


BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, 85) AS bxor,
       ~o_orderkey AS bnot,
       o_orderkey << 3 AS shl,
       o_orderkey >> 2 AS shr,
       bit_count(o_orderkey) AS popcount
FROM orders WHERE o_orderkey < 500
"""


# --------------------------------------------------------------------------
# Filtered aggregates (SQL:2003 FILTER clause) + boolean aggregates: the
# conditional-aggregation form that pushes the predicate INTO the agg
# buffer update instead of a CASE projection — one pass, no extra columns.
# --------------------------------------------------------------------------


def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("count(*) FILTER (WHERE o_totalprice > 200000.0)").alias("n_big"),
        F.expr(
            "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))"
            " FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)"
        ).alias("urgent_total"),
        F.expr("bool_or(o_totalprice > 400000.0)").alias("any_huge"),
        F.expr("bool_and(o_totalprice > 1000.0)").alias("all_above_1k"),
        F.expr("count_if(o_orderpriority = '5-LOW')").alias("n_low"),
    )


FILTERED_AGG_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
       bool_or(o_totalprice > 400000.0) AS any_huge,
       bool_and(o_totalprice > 1000.0) AS all_above_1k,
       CAST(count_if(o_orderpriority = '5-LOW') AS BIGINT) AS n_low
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Lateral OUTER explode (null-preserving row generation)
# --------------------------------------------------------------------------


def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: the null-preserving lateral — a row whose array is
    EMPTY survives as (doc_id, NULL, NULL) instead of vanishing, the
    LEFT JOIN LATERAL semantics a plain explode silently breaks (losing
    parent rows is the classic fan-out bug in enrichment pipelines). The
    'q'-prefix filter leaves ~23% of documents with an empty match list at
    sf0.01, so the outer path is genuinely exercised. Map-side only."""
    from lua_mapreduce_spark.functions.texthash import words_expr

    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id",
        F.expr(f"filter({words_expr('text')}, w -> startswith(w, 'q'))").alias("sw"),
    )
    return arr.select("doc_id", F.posexplode_outer("sw").alias("pos", "token"))


# DuckDB's unnest drops empty lists; [NULL] substitution + a len guard on
# the position reproduces posexplode_outer exactly.
def _explode_outer_oracle() -> str:
    from lua_mapreduce_spark.functions.texthash import oracle_words_expr

    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter({oracle_words_expr("text")}, w -> starts_with(w, 'q')) AS sw
  FROM documents),
x AS (SELECT doc_id, CASE WHEN len(sw) = 0 THEN [NULL] ELSE sw END AS sw2,
             len(sw) AS n
      FROM t),
u AS (SELECT doc_id, n, unnest(sw2) AS token,
             generate_subscripts(sw2, 1) AS p
      FROM x)
SELECT doc_id,
       CASE WHEN n = 0 THEN NULL ELSE CAST(p - 1 AS INT) END AS pos,
       token
FROM u
"""


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode-Muthukrishnan 2005) — fully value-checked
# --------------------------------------------------------------------------
#
# Unlike the HLL/GK sketches (engine-native, accuracy-boolean contract),
# this CM sketch is built from the repo's portable md5 hashes with plain
# integer counters, so EVERY cell and every estimate is bit-reproducible
# in DuckDB: the oracle replays the build and the probes. The structural
# guarantee est >= exact (CM never underestimates) is emitted as a column
# and asserted TRUE by both engines. Scale shape: the build is one
# map-side-combinable groupBy into <= _CM_D * _CM_W cells (a fixed-size
# state no matter the input — the point of a sketch); probing joins the
# distinct keys against the broadcast cell table.

_CM_D = 4  # hash rows
_CM_W = 1024  # counters per row
_CM_SALTS = tuple(f"cm{d}:" for d in range(_CM_D))


def _cm_pos(col_sql: str, salt: str) -> str:
    salted = f"concat('{salt}', CAST({col_sql} AS STRING))"
    return f"pmod({md5_bigint_expr(salted)}, {_CM_W})"


def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-count estimates from a 4x1024 Count-Min sketch,
    joined against exact counts: (key, exact, est, no_underestimate)."""
    orders = load_table(spark, sf_dir, "orders")
    pos_structs = ", ".join(
        f"struct({d} AS d, {_cm_pos('o_custkey', _CM_SALTS[d])} AS pos)"
        for d in range(_CM_D)
    )
    cells = (
        orders.select(F.explode(F.expr(f"array({pos_structs})")).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    probes = exact.select(
        "key",
        "exact",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d} AS d, {_cm_pos('key', _CM_SALTS[d])} AS pos)"
                    for d in range(_CM_D)
                )
                + ")"
            )
        ).alias("c"),
    ).select("key", "exact", F.col("c.d").alias("d"), F.col("c.pos").alias("pos"))
    return (
        probes.join(F.broadcast(cells), ["d", "pos"])
        .groupBy("key", "exact")
        .agg(F.min("cnt").alias("est"))
        .select(
            "key",
            "exact",
            "est",
            (F.col("est") >= F.col("exact")).alias("no_underestimate"),
        )
    )


def _countmin_oracle() -> str:
    def pos(col, salt):
        h = oracle_md5_bigint_expr(f"concat('{salt}', CAST({col} AS VARCHAR))")
        return f"(({h}) % {_CM_W} + {_CM_W}) % {_CM_W}"

    cell_rows = "\n    UNION ALL\n".join(
        f"    SELECT {d} AS d, {pos('o_custkey', _CM_SALTS[d])} AS pos FROM orders"
        for d in range(_CM_D)
    )
    probe_rows = "\n    UNION ALL\n".join(
        f"    SELECT key, exact, {d} AS d, {pos('key', _CM_SALTS[d])} AS pos FROM exact"
        for d in range(_CM_D)
    )
    return f"""
WITH cells AS (
  SELECT d, pos, COUNT(*) AS cnt FROM (
{cell_rows}
  ) GROUP BY d, pos),
exact AS (
  SELECT o_custkey AS key, COUNT(*) AS exact FROM orders GROUP BY o_custkey),
probes AS (
{probe_rows}
)
SELECT p.key, p.exact, MIN(c.cnt) AS est,
       MIN(c.cnt) >= p.exact AS no_underestimate
FROM probes p JOIN cells c ON p.d = c.d AND p.pos = c.pos
GROUP BY p.key, p.exact
"""


QUERIES = {
    "agg_countmin_sketch": agg_countmin_sketch,
    "scalar_explode_outer": scalar_explode_outer,
    "agg_null_semantics": agg_null_semantics,
    "scalar_string_predicates": scalar_string_predicates,
    "scalar_bitwise_funcs": scalar_bitwise_funcs,
    "agg_filtered_counts": agg_filtered_counts,
    "scalar_map_higher_order": scalar_map_higher_order,
    "scalar_regex_funcs": scalar_regex_funcs,
    "scalar_timestamp_diff": scalar_timestamp_diff,
    "scalar_higher_order_funcs": scalar_higher_order_funcs,
    "q13_customer_distribution": q13_customer_distribution,
    "agg_histogram_bins": agg_histogram_bins,
    "upsert_snapshot_merge": upsert_snapshot_merge,
    "udaf_group_median_pandas": udaf_group_median_pandas,
    "sample_deterministic_hash": sample_deterministic_hash,
    "scalar_string_advanced": scalar_string_advanced,
    "agg_collect_sorted_sets": agg_collect_sorted_sets,
    "scalar_math_funcs": scalar_math_funcs,
    "agg_approx_distinct_sketch": agg_approx_distinct_sketch,
    "agg_approx_percentile_sketch": agg_approx_percentile_sketch,
    "agg_heavy_hitters_sketch": agg_heavy_hitters_sketch,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q7_nation_trade_volume": q7_nation_trade_volume,
    "q8_market_share": q8_market_share,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
    "join_skew_salted": join_skew_salted,
}

ORACLES = {
    "agg_countmin_sketch": _countmin_oracle(),
    "scalar_explode_outer": _explode_outer_oracle(),
    "agg_null_semantics": NULL_SEMANTICS_ORACLE,
    "scalar_string_predicates": STRING_PREDICATES_ORACLE,
    "scalar_bitwise_funcs": BITWISE_ORACLE,
    "agg_filtered_counts": FILTERED_AGG_ORACLE,
    "scalar_map_higher_order": MAP_HOF_ORACLE,
    "scalar_regex_funcs": SCALAR_REGEX_ORACLE,
    "scalar_timestamp_diff": SCALAR_TSDIFF_ORACLE,
    "scalar_higher_order_funcs": HOF_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "agg_histogram_bins": HISTOGRAM_ORACLE,
    "upsert_snapshot_merge": UPSERT_ORACLE,
    "udaf_group_median_pandas": UDAF_MEDIAN_ORACLE,
    "sample_deterministic_hash": SAMPLE_ORACLE,
    "scalar_string_advanced": SCALAR_STRING_ADV_ORACLE,
    "agg_collect_sorted_sets": COLLECT_SETS_ORACLE,
    "scalar_math_funcs": SCALAR_MATH_ORACLE,
    "agg_heavy_hitters_sketch": HEAVY_HITTERS_ORACLE,
    "agg_approx_distinct_sketch": APPROX_DISTINCT_ORACLE,
    "agg_approx_percentile_sketch": APPROX_PERCENTILE_ORACLE,
    "q19_disjunctive_revenue": Q19_ORACLE,
    "q7_nation_trade_volume": Q7_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q17_small_quantity_revenue": Q17_ORACLE,
    "q22_dormant_rich_customers": Q22_ORACLE,
    "join_skew_salted": SALTED_JOIN_ORACLE,
}

"""Scale-technique operators: runtime bloom-filter join pruning,
exact-quota stratified sampling, and Z-order (Morton curve) data layout.

These are the three classic levers a 100 TB deployment pulls that the
smaller operator files don't yet demonstrate explicitly:

- **Bloom prefilter (semi-join reduction)**: kill probe-side rows BEFORE
  the join shuffle. Spark has a native version (runtime bloom filters,
  ``spark.sql.optimizer.runtime.bloomFilter.enabled``) that only fires on
  cost-estimate heuristics; this operator is the explicit, deterministic
  composition, so the plan is assertable and the result oracle-checkable.
- **Stratified sampling with exact per-stratum quotas**: ``sampleBy`` is
  probabilistic (quota only in expectation, not partition-stable); a
  window rank over a deterministic md5 order gives exact quotas and
  reproducibility, and Spark's WindowGroupLimit rewrite prunes each
  stratum map-side so no stratum is ever fully sorted.
- **Z-order layout**: interleave the bits of two filter columns into one
  sort key so range-clustered files carry narrow footer min/max ranges on
  BOTH dimensions — multi-dimensional file skipping, the layout trick
  behind Delta/Iceberg ``ZORDER BY``. The 1-D special case is
  ``sources.readers.write_clustered_parquet``.

The reference engine has no analogue for any of these (its one workload
is word count, example/word-count-taskfile.lua:73-159); they extend the
north-star pipeline surface the same way curation.py does. Everything is
built-in-function only — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.texthash import (
    md5_bigint_expr,
    oracle_md5_bigint_expr,
)

# --------------------------------------------------------------------------
# Runtime bloom-filter join pruning (semi-join reduction).
#
# Query shape: orders of BUILDING-segment customers, aggregated by order
# priority. The naive plan shuffles ALL orders into the join; the bloom
# path builds a 2-hash filter over the ~1/5 of customers that survive the
# segment predicate, packs it into a DENSE bitset of _BLOOM_M bits (1024
# longs = 8 KB broadcast, constant at ANY build-side cardinality), and
# drops ~80% of probe rows map-side before the shuffle with an O(1)
# element_at + bit-test per row (a position ARRAY would make every probe
# an O(set-bits) array_contains scan — measured 4.2 s vs 1 s at sf0.1).
# The final equi-join makes the result EXACT regardless of false
# positives, so the oracle is the plain semi-join — the bloom is pure
# plan optimization, which is precisely why it is safe at 100 TB.
#
# Hashing goes through md5 (portable, see functions/texthash.py) so the
# filter itself is deterministic and engine-independent.
# --------------------------------------------------------------------------

_BLOOM_M = 1 << 16  # bit-space size; fp ~0.8% at 3k members, k=2
_BLOOM_WORDS = _BLOOM_M // 64
_BLOOM_SALTS = ("bf1:", "bf2:")
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(col_sql: str, salt: str) -> str:
    """SQL: position of one salted hash of a key column in [0, _BLOOM_M)."""
    h = md5_bigint_expr(f"concat('{salt}', CAST({col_sql} AS STRING))")
    return f"pmod({h}, {_BLOOM_M})"


def _bloom_bitset(members: DataFrame, key_col: str = "c_custkey") -> DataFrame:
    """1-row DataFrame with `bloom` = dense array of _BLOOM_WORDS longs.

    Build: explode the k salted positions, OR each word's bits with a
    map-side-combinable bit_or agg (_BLOOM_WORDS rows max reach the
    final agg), then densify the sparse (word -> bits) map onto
    sequence(0, _BLOOM_WORDS-1) so probes index it in O(1)."""
    pos_arr = ", ".join(_bloom_pos(key_col, s) for s in _BLOOM_SALTS)
    words = (
        members.select(F.explode(F.expr(f"array({pos_arr})")).alias("pos"))
        .groupBy(F.expr("pos DIV 64").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
            ).alias("bits")
        )
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bm")
    ).selectExpr(
        f"transform(sequence(0, {_BLOOM_WORDS - 1}),"
        " w -> coalesce(bm[w], CAST(0 AS BIGINT))) AS bloom"
    )


def _bloom_hit(col_sql: str, salt: str):
    """O(1) membership probe: pick the word, test the bit."""
    p = _bloom_pos(col_sql, salt)
    return F.expr(
        f"pmod(shiftrightunsigned("
        f"element_at(bloom, CAST(({p}) DIV 64 AS INT) + 1),"
        f" CAST(pmod({p}, 64) AS INT)), 2) = 1"
    )


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    cust = customer.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select(
        "c_custkey"
    )
    bits = _bloom_bitset(cust)
    # Probe side: scalar broadcast + map-side membership test on both
    # hashes, BEFORE the join shuffle.
    pruned = (
        orders.join(F.broadcast(bits))  # 1-row scalar cross join
        .filter(
            _bloom_hit("o_custkey", _BLOOM_SALTS[0])
            & _bloom_hit("o_custkey", _BLOOM_SALTS[1])
        )
        .drop("bloom")
    )
    # Exact verification join: false positives die here.
    return (
        pruned.join(cust, pruned.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


def bloom_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic companion: probe rows before/after the bloom prefilter
    and after the exact join — measures the shuffle-byte reduction the
    prefilter buys (tests assert pruned ~= matched, i.e. low fp)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust = customer.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select(
        "c_custkey"
    )
    bits = _bloom_bitset(cust)
    probed = orders.join(F.broadcast(bits)).select(
        (
            _bloom_hit("o_custkey", _BLOOM_SALTS[0])
            & _bloom_hit("o_custkey", _BLOOM_SALTS[1])
        ).alias("bloom_pass"),
        "o_custkey",
    )
    matched = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_semi"
    ).count()
    return probed.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.lit(matched).alias("n_matched"),
    )


BLOOM_PREFILTER_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = '{_BLOOM_SEGMENT}')
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Exact-quota stratified sampling.
#
# Balanced per-source mixtures need "exactly k docs per stratum", not
# sampleBy's binomial draw. Deterministic order = md5(doc_id) with doc_id
# tiebreak; row_number per stratum; keep rn <= quota. The rn-filter
# compiles to WindowGroupLimit, which truncates every stratum to its top
# quota rows map-side BEFORE the window shuffle — so a billion-row
# stratum moves only quota rows per input partition, never a full sort.
# One hash shuffle total (the window partition).
# --------------------------------------------------------------------------

_STRATA_QUOTA = 12
_STRATA_SALT = "strat:"


def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.expr(
        md5_bigint_expr(f"concat('{_STRATA_SALT}', CAST(doc_id AS STRING))")
    )
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRATA_QUOTA)
        .select("doc_id", "source", "lang", "rn")
    )


STRATIFIED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, lang,
         {oracle_md5_bigint_expr(f"concat('{_STRATA_SALT}', CAST(doc_id AS VARCHAR))")} AS k
  FROM documents)
SELECT doc_id, source, lang, CAST(rn AS INT) AS rn FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
  FROM keyed)
WHERE rn <= {_STRATA_QUOTA}
"""


# --------------------------------------------------------------------------
# Z-order (Morton) layout keys.
#
# z interleaves the bits of two dimensions (user id, epoch-hour) so a
# single range-cluster on z yields files whose parquet footers are narrow
# in BOTH dimensions — scans filtering on either column skip most files.
#
# Each dimension is first min-max normalized onto the full _Z_BITS-wide
# integer range: interleaving RAW values lets the wider column's high
# bits dominate the key and the narrow column degenerates to unclustered
# (measured: 10-bit hours vs 8-bit user ids left per-file user spans at
# ~0.9 of global). Production z-order does the same (rank or min-max
# normalization before interleave). Bounds come from one tiny min/max
# aggregate broadcast back over the rows — at 100 TB that is a metadata-
# scale pass (parquet footers can even answer it), not a data shuffle.
#
# All arithmetic is integer ((v DIV 2^i) % 2 terms) — bit-identical in
# any engine — so the registered query carries a full value oracle.
# --------------------------------------------------------------------------

_Z_BITS = 10  # 10+10 bits -> 20-bit z key
_Z_MAX = (1 << _Z_BITS) - 1


def _z_terms(x_sql: str, y_sql: str, div_op: str) -> str:
    """SQL for the Morton interleave of two _Z_BITS-wide ints.

    ``div_op`` abstracts integer division: Spark ``DIV``, DuckDB ``//``.
    """
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({x_sql}) {div_op} {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"(({y_sql}) {div_op} {1 << i}) % 2 * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _scale_sql(v: str, vmin: str, vmax: str, div_op: str) -> str:
    """Min-max scale ``v`` onto [0, _Z_MAX] with pure integer arithmetic."""
    rng = f"greatest(({vmax}) - ({vmin}), 1)"
    return f"((({v}) - ({vmin})) * {_Z_MAX}) {div_op} {rng}"


_ZY_SPARK = "CAST(unix_timestamp(ts) AS BIGINT) DIV 3600"
_ZY_DUCK = "CAST(floor(epoch(ts)) AS BIGINT) // 3600"


def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id",
        "CAST(user_id AS BIGINT) AS x",
        f"{_ZY_SPARK} AS y",
    )
    bounds = ev.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    zx = _scale_sql("x", "xmin", "xmax", "DIV")
    zy = _scale_sql("y", "ymin", "ymax", "DIV")
    return ev.join(F.broadcast(bounds)).selectExpr(
        "event_id",
        f"CAST({zx} AS BIGINT) AS zx",
        f"CAST({zy} AS BIGINT) AS zy",
        f"CAST({_z_terms(zx, zy, 'DIV')} AS BIGINT) AS z",
    )


def _zorder_oracle() -> str:
    zx = _scale_sql("x", "xmin", "xmax", "//")
    zy = _scale_sql("y", "ymin", "ymax", "//")
    return f"""
WITH raw AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS x, {_ZY_DUCK} AS y
  FROM events),
b AS (
  SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
  FROM raw)
SELECT event_id,
       CAST({zx} AS BIGINT) AS zx,
       CAST({zy} AS BIGINT) AS zy,
       CAST({_z_terms(zx, zy, "//")} AS BIGINT) AS z
FROM raw, b
"""


ZORDER_ORACLE = _zorder_oracle()


def write_zorder_parquet(
    df: DataFrame, path: str, x: str, y: str, n_files: int
) -> None:
    """Range-cluster ``df`` on the Morton key of (x, y) and write parquet.

    Each output file then spans ~1/n_files of the z space = a small
    aligned square in normalized (x, y), so its footer min/max is narrow
    on BOTH columns and readers filtering on either one skip most files.
    One range exchange at write time buys every future scan two pruning
    dimensions; contrast write_clustered_parquet, whose single sort key
    leaves the second dimension unclustered.
    """
    bounds = df.agg(
        F.expr(f"CAST(min({x}) AS BIGINT)").alias("__xmin"),
        F.expr(f"CAST(max({x}) AS BIGINT)").alias("__xmax"),
        F.expr(f"CAST(min({y}) AS BIGINT)").alias("__ymin"),
        F.expr(f"CAST(max({y}) AS BIGINT)").alias("__ymax"),
    )
    zx = _scale_sql(f"CAST({x} AS BIGINT)", "__xmin", "__xmax", "DIV")
    zy = _scale_sql(f"CAST({y} AS BIGINT)", "__ymin", "__ymax", "DIV")
    keyed = df.join(F.broadcast(bounds)).withColumn(
        "__z", F.expr(_z_terms(zx, zy, "DIV")).cast("bigint")
    )
    keyed.repartitionByRange(n_files, "__z").sortWithinPartitions(
        "__z"
    ).drop("__z", "__xmin", "__xmax", "__ymin", "__ymax").write.mode(
        "overwrite"
    ).parquet(path)


# --------------------------------------------------------------------------
# Exact distinct counting via bitmap aggregation.
#
# COUNT(DISTINCT) over a dense integer key compiles to a two-phase Expand
# plan that shuffles every (group, key) pair. The bitmap formulation
# groups by (group, key DIV 64) with a map-side-combinable bit_or — the
# shuffle carries at most 1/64th the rows (one long per populated word),
# then a tiny second agg sums bit_count per group. Exact at any scale,
# the technique behind bitmap-distinct columns in ClickHouse/Doris; HLL
# (agg_approx_distinct_sketch) is the approximate sibling when even the
# bitmap is too wide. Pure integer ops -> full value oracle.
# --------------------------------------------------------------------------


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    words = orders.groupBy(
        "o_orderpriority", F.expr("o_custkey DIV 64").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 64 AS INT)))"
        ).alias("bits")
    )
    return words.groupBy("o_orderpriority").agg(
        F.expr("CAST(sum(bit_count(bits)) AS BIGINT)").alias("n_custs")
    )


BITMAP_DISTINCT_ORACLE = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Proportional-allocation sampling (Hamilton largest-remainder quotas)
# --------------------------------------------------------------------------

# Total sample budget. Quotas are allocated across sources proportionally
# to their row counts with the largest-remainder (Hamilton) method: exact
# integer arithmetic, quotas sum to the budget EXACTLY, and every source
# with rows can win at most one remainder seat — the textbook fair
# apportionment, here as the "sample 100 docs proportionally" primitive a
# mixture pipeline needs when per-source keep RATES (curation_sample_mixture)
# must become exact COUNTS.
_PROP_BUDGET = 100
_PROP_SALT = "prop:"


def curation_proportional_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional quotas per source, largest-remainder method,
    then the deterministic md5-ordered head of each source.

    Scale shape: the stats relation is a grouped aggregate on source
    (bounded: source is a low-cardinality code), the apportionment windows
    run over those few rows, and the per-source head is the same
    WindowGroupLimit map-side truncation the stratified sampler compiles
    to. All arithmetic integer -> exact value oracle."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = stats.agg(F.sum("n").alias("tot"))
    base = (
        stats.join(F.broadcast(tot))
        .select(
            "source",
            "n",
            F.expr(f"CAST(({_PROP_BUDGET} * n) DIV tot AS BIGINT)").alias("base"),
            # remainder scaled by tot: integer-exact tie-breakable
            F.expr(f"{_PROP_BUDGET} * n % tot").alias("rem"),
        )
    )
    leftover_w = Window.orderBy(F.desc("rem"), F.asc("source"))
    sum_w = Window.partitionBy()
    quota = base.select(
        "source",
        "n",
        (
            F.col("base")
            + (
                F.row_number().over(leftover_w)
                <= F.lit(_PROP_BUDGET) - F.sum("base").over(sum_w)
            ).cast("bigint")
        ).alias("quota"),
    )
    key = F.expr(
        md5_bigint_expr(f"concat('{_PROP_SALT}', CAST(doc_id AS STRING))")
    )
    pick_w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(pick_w))
        .join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", F.col("rn").cast("int").alias("rn"), "quota")
    )


PROPORTIONAL_SAMPLE_ORACLE = f"""
WITH stats AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
tot AS (SELECT SUM(n) AS tot FROM stats),
base AS (
  SELECT source, n,
         CAST(({_PROP_BUDGET} * n) // tot AS BIGINT) AS base,
         {_PROP_BUDGET} * n % tot AS rem
  FROM stats CROSS JOIN tot),
quota AS (
  SELECT source, n,
         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
                          <= {_PROP_BUDGET} - SUM(base) OVER ()
                     THEN 1 ELSE 0 END AS quota
  FROM base),
keyed AS (
  SELECT doc_id, source,
         {oracle_md5_bigint_expr(f"concat('{_PROP_SALT}', CAST(doc_id AS VARCHAR))")} AS k
  FROM documents),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
  FROM keyed)
SELECT r.doc_id, r.source, CAST(r.rn AS INT) AS rn, q.quota
FROM ranked r JOIN quota q USING (source)
WHERE r.rn <= q.quota
"""


QUERIES = {
    "join_bloom_prefilter": join_bloom_prefilter,
    "curation_stratified_sample": curation_stratified_sample,
    "layout_zorder_keys": layout_zorder_keys,
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "curation_proportional_sample": curation_proportional_sample,
}

ORACLES = {
    "join_bloom_prefilter": BLOOM_PREFILTER_ORACLE,
    "curation_stratified_sample": STRATIFIED_SAMPLE_ORACLE,
    "layout_zorder_keys": ZORDER_ORACLE,
    "agg_bitmap_distinct": BITMAP_DISTINCT_ORACLE,
    "curation_proportional_sample": PROPORTIONAL_SAMPLE_ORACLE,
}

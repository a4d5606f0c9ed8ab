"""Behavioral + plan-shape invariants for the round-7 scale-technique
operators (oracle parity is in test_oracle_parity.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ------------------------------------------------------ bitmap set algebra


def test_bitmap_intersect_set_identities(spark):
    r = QUERIES["agg_bitmap_intersect"](spark, SF_MEDIUM).collect()[0]
    assert r.n_both <= min(r.n_signup, r.n_purchase)
    assert r.n_any == r.n_signup + r.n_purchase - r.n_both  # inclusion-exclusion
    assert 0 <= r.jaccard_permille <= 1000
    assert r.jaccard_permille == (1000 * r.n_both) // r.n_any


def test_bitmap_intersect_no_expand_no_distinct_join(spark):
    """The whole point: set algebra WITHOUT the COUNT(DISTINCT) Expand or
    a distinct-vs-distinct self-join. One aggregation keyed on the word
    index, map-side combinable."""
    plan = _plan(QUERIES["agg_bitmap_intersect"](spark, SF_MEDIUM))
    assert "Expand" not in plan
    assert "partial_bit_or" in plan  # map-side combine of the packed words
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


# -------------------------------------------------- bin-bucketed range join


def test_range_join_binned_is_equi_join(spark):
    """The rewrite's contract: the value-vs-interval join runs as a hash
    EQUI-join on the bin id, not a nested loop over the range table."""
    df = QUERIES["range_join_binned"](spark, SF_MEDIUM)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # every event lands in exactly one band (bands partition the domain)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_MEDIUM}/events.parquet").count()
    assert total == n_events


def test_range_join_binned_matches_direct_range_join(spark):
    """Residual filter makes the binned rewrite exact: equal to the naive
    BETWEEN join on the same bands."""
    from lua_mapreduce_spark.operators.scale_ops2 import _RB_BANDS

    got = {
        (r.band_lo, r.band_hi): (r.n_events, r.sum_cents)
        for r in QUERIES["range_join_binned"](spark, SF_SMALL).collect()
    }
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("v_c")
    )
    bands = spark.createDataFrame(_RB_BANDS, "lo long, hi long")
    direct = {
        (r.lo, r.hi): (r.n, r.s)
        for r in ev.join(
            bands, (F.col("v_c") >= F.col("lo")) & (F.col("v_c") < F.col("hi"))
        )
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(v_c) AS BIGINT)").alias("s"),
        )
        .collect()
    }
    assert got == direct and got


# ------------------------------------------------------- vector centroids


def test_vector_centroids_shape_and_replay(spark):
    rows = QUERIES["agg_vector_centroids"](spark, SF_SMALL).collect()
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    labels = {r.label for r in emb}
    assert len(rows) == len(labels) * 64
    # Python replay of one (label, dim) cell with the same quantizer
    import collections

    sums: dict = collections.defaultdict(int)
    counts: dict = collections.defaultdict(int)
    for r in emb:
        for d, x in enumerate(r.embedding):
            sums[(r.label, d)] += round(float(x) * 1_000_000.0)
            counts[(r.label, d)] += 1
    for r in rows:
        assert r.sum_micro == sums[(r.label, r.dim)]
        assert r.n == counts[(r.label, r.dim)]
        assert r.centroid == r.sum_micro / r.n / 1_000_000.0


def test_vector_centroids_map_side_combine(spark):
    plan = _plan(QUERIES["agg_vector_centroids"](spark, SF_MEDIUM))
    assert "partial_sum" in plan  # partial agg before the (label, dim) shuffle
    assert "Generate" in plan  # posexplode is map-side, pre-shuffle


# ---------------------------------------------------- length curriculum


def test_length_buckets_partition_and_cumulative(spark):
    rows = sorted(
        QUERIES["curation_length_buckets"](spark, SF_SMALL).collect(),
        key=lambda r: r.bucket,
    )
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert rows[-1].cum_docs == n_docs
    running = 0
    for r in rows:
        running += r.n_docs
        assert r.cum_docs == running
        # log2-width bucket bound: bucket b holds lengths in [2^(b-1), 2^b)
        if r.min_tokens > 0:
            assert 2 ** (r.bucket - 1) <= r.min_tokens
            assert r.max_tokens < 2**r.bucket

"""Sketch aggregates: HLL/GK estimates must land near the exact values;
the Misra-Gries heavy-hitter sketch must honor its superset guarantee."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lua_mapreduce_spark.operators import QUERIES
from lua_mapreduce_spark.operators.relational4 import _mg, heavy_hitters
from tests.conftest import SF_MEDIUM


def test_approx_percentile_within_error(spark):
    """The query's own within_rank_error boolean must hold, and the
    discrete median it reports must match an independent recomputation."""
    rows = QUERIES["agg_approx_percentile_sketch"](spark, SF_MEDIUM).collect()
    assert rows, "no groups"
    orders = spark.read.parquet(f"{SF_MEDIUM}/orders.parquet")
    for r in rows:
        assert r.within_rank_error, f"{r.o_orderstatus}: sketch out of bound"
        vals = sorted(
            x.o_totalprice
            for x in orders.filter(
                F.col("o_orderstatus") == r.o_orderstatus
            ).collect()
        )
        assert r.n_rows == len(vals)
        assert r.p50_disc == vals[(len(vals) + 1) // 2 - 1]


def test_approx_distinct_within_error(spark):
    """within_rsd must hold, and independently the HLL estimate must land
    within 5% of exact (tighter than the query's own 10% contract)."""
    rows = QUERIES["agg_approx_distinct_sketch"](spark, SF_MEDIUM).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.within_rsd, f"{r.l_returnflag}: sketch out of bound"
    li = spark.read.parquet(f"{SF_MEDIUM}/lineitem.parquet")
    est = {
        r.l_returnflag: r.est
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("est"))
        .collect()
    }
    for r in rows:
        rel_err = abs(est[r.l_returnflag] - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err < 0.05, f"{r.l_returnflag}: {rel_err:.3f}"


def test_frequent_keys_matches_exact_threshold(spark):
    """The registry query's output must equal the exact phi-threshold set
    computed independently (groupBy count + HAVING, same tie-break)."""
    from lua_mapreduce_spark.operators.relational4 import _FK_PHI_DENOM

    got = [tuple(r) for r in QUERIES["agg_heavy_hitters_sketch"](spark, SF_MEDIUM).collect()]
    events = spark.read.parquet(f"{SF_MEDIUM}/events.parquet")
    n = events.count()
    want = [
        tuple(r)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * _FK_PHI_DENOM > n)
        .orderBy(F.col("freq").desc(), "user_id")
        .collect()
    ]
    assert got == want
    assert got, "phi threshold vacuous at sf0.01 — no rows to compare"


def test_frequent_keys_flat_data_returns_empty(spark):
    """Adversarial flat distribution (the shape that breaks sketch-top-k):
    every key equally frequent, all below the phi threshold. The correct
    answer is EMPTY — a sketch-induced false positive would surface here."""
    from lua_mapreduce_spark.operators.relational4 import frequent_keys

    rows = [(i % 500,) for i in range(10_000)]  # 500 keys x 20 events
    df = spark.createDataFrame(rows, "k long").repartition(8)
    out = frequent_keys(df, "k", phi_denom=100, capacity=256).collect()
    assert out == []


def test_frequent_keys_rejects_unguaranteed_phi():
    from lua_mapreduce_spark.operators.relational4 import frequent_keys

    import pytest

    with pytest.raises(ValueError):
        frequent_keys(None, "k", phi_denom=300, capacity=256)


def test_misra_gries_partial_superset_guarantee():
    """Weighted MG with capacity m over N rows: every key with frequency
    > N/(m+1) survives; at most m counters are kept; every kept estimate
    is a lower bound on the true count. Zipf-ish synthetic data with far
    more distinct keys than capacity forces the eviction path."""
    capacity = 8
    # key i appears 1000//(i+1) times, i = 0..199: heavy head, long tail.
    true = {i: 1000 // (i + 1) for i in range(200)}
    rows = [k for k, c in true.items() for _ in range(c)]
    n = len(rows)
    # Split into 3 uneven batches to exercise cross-batch accumulation.
    batches = [
        pd.DataFrame({"key": rows[: n // 3]}),
        pd.DataFrame({"key": rows[n // 3 : 2 * n // 3]}),
        pd.DataFrame({"key": rows[2 * n // 3 :]}),
    ]
    (out,) = list(_mg(capacity)(batches))
    est = dict(zip(out["key"], out["est"]))
    assert len(est) <= capacity
    threshold = n / (capacity + 1)
    for k, c in true.items():
        if c > threshold:
            assert k in est, f"guaranteed heavy hitter {k} (freq {c}) evicted"
    for k, e in est.items():
        assert e <= true[k], f"MG estimate must lower-bound the true count"


def test_heavy_hitters_distributed_eviction_still_exact(spark):
    """End-to-end with capacity far below the distinct-key count: the
    sketch pass must evict, yet the exact recount still returns the true
    top-k because every true heavy hitter survives the candidate merge."""
    true = {i: 2000 // (i + 1) for i in range(300)}
    rows = [(k,) for k, c in true.items() for _ in range(c)]
    n = sum(true.values())
    # capacity chosen so the guarantee threshold N/(m+1) sits BELOW the
    # 5th frequency (400) — exactness is then guaranteed, not lucky —
    # while 300 distinct keys per task still force the eviction path.
    capacity = 32
    assert n / (capacity + 1) < sorted(true.values(), reverse=True)[4]
    df = spark.createDataFrame(rows, "k long").repartition(4)
    got = [tuple(r) for r in heavy_hitters(df, "k", 5, capacity=capacity).collect()]
    want = sorted(true.items(), key=lambda kc: (-kc[1], kc[0]))[:5]
    assert got == [(k, c) for k, c in want]


def test_countmin_never_underestimates_and_error_is_bounded(spark):
    """The CM structural guarantee (est >= exact) holds for EVERY key, and
    the mean overestimate stays within a small multiple of N/W (the
    expected-error bound; deterministic here since the hashes are md5)."""
    from lua_mapreduce_spark.operators import QUERIES
    from lua_mapreduce_spark.operators.relational4 import _CM_W

    rows = QUERIES["agg_countmin_sketch"](spark, SF_MEDIUM).collect()
    assert rows and all(r.no_underestimate for r in rows)
    n_orders = spark.read.parquet(f"{SF_MEDIUM}/orders.parquet").count()
    mean_err = sum(r.est - r.exact for r in rows) / len(rows)
    assert mean_err <= 3.0 * n_orders / _CM_W, f"mean overestimate {mean_err}"

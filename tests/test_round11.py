"""Round-11 operator tests: TPC-H refresh streams (RF1/RF2), the
vacuum/retention planner, integer-grid Lloyd's k-means, the zone-map
data-skipping estimator, VAD audio segmentation, the KMV/theta sketch
(batch + streaming-state faces), and the curation filter-drift audit."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.operators import analytics5 as a5
from lua_mapreduce_spark.operators import relational5 as r5
from tests.conftest import SF_MEDIUM, SF_SMALL


# --------------------------------------------------------------------------
# tpch_refresh_streams
# --------------------------------------------------------------------------


def _audit_rows(spark, sf):
    return {
        (r["relation"], r["status"]): r
        for r in r5.tpch_refresh_streams(spark, sf).collect()
    }


def test_refresh_insert_keys_disjoint(spark):
    """The in-query key audit: for orders (key = grain), n_keys_after ==
    n_after proves the max(k)+1 offset put every RF1 clone on a fresh
    key — a collision would fold two rows onto one key."""
    for sf in (SF_SMALL, SF_MEDIUM):
        for (rel, status), r in _audit_rows(spark, sf).items():
            if rel == "orders":
                assert r["n_keys_after"] == r["n_after"], (sf, status, r)


def test_refresh_deltas_nonvacuous(spark):
    """Every (relation, status) group must show a nonzero cents delta at
    both parity SFs — the 2%-batch rate exists exactly so the gate never
    passes on an empty refresh (the CDC insert-offset lesson)."""
    for sf in (SF_SMALL, SF_MEDIUM):
        rows = _audit_rows(spark, sf)
        assert len(rows) == 5  # orders F/O/P + lineitem F/O
        for key, r in rows.items():
            assert r["cents_delta"] != 0, (sf, key)


def test_refresh_orders_and_lines_move_together(spark):
    """Referential consistency of the key-predicate form: an order is in
    the RF2 delete batch iff ALL its lineitems are (both sides evaluate
    the same md5 predicate on the same key)."""
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    from lua_mapreduce_spark.functions.texthash import md5_bigint_expr

    h_o = md5_bigint_expr("concat('rf2-', CAST(o_orderkey AS STRING))")
    h_l = md5_bigint_expr("concat('rf2-', CAST(l_orderkey AS STRING))")
    o_del = orders.filter(F.expr(f"{h_o} % {r5._RF_MOD} = 0")).select(
        F.col("o_orderkey").alias("k")
    )
    l_del = li.filter(F.expr(f"{h_l} % {r5._RF_MOD} = 0")).select(
        F.col("l_orderkey").alias("k")
    )
    # no deleted lineitem key outside the deleted-order key set, and
    # every deleted order with lines loses at least one line
    stray = l_del.join(o_del, "k", "left_anti").count()
    assert stray == 0
    covered = o_del.join(li, o_del.k == li.l_orderkey, "semi").count()
    deleted_lines = l_del.select("k").distinct().count()
    assert deleted_lines == covered


def test_refresh_batch_rate_close_to_nominal(spark):
    """The md5 predicate selects ~1/_RF_MOD of orders (binomial; allow
    6 sigma) — a degenerate hash would skew this wildly."""
    rows = _audit_rows(spark, SF_MEDIUM)
    n_base = sum(r["n_base"] for (rel, _), r in rows.items() if rel == "orders")
    # net delta = ins - del with ins, del ~ Binomial(n_base, 1/_RF_MOD):
    # mean 0, sd = sqrt(2) * sigma. 6 sigma would only trip on a
    # structurally-degenerate hash, not on sampling noise.
    sigma = (n_base * (1 / r5._RF_MOD) * (1 - 1 / r5._RF_MOD)) ** 0.5
    net = sum(r["n_delta"] for (rel, _), r in rows.items() if rel == "orders")
    assert abs(net) < 6 * sigma, (net, sigma)


# --------------------------------------------------------------------------
# layout_vacuum_plan
# --------------------------------------------------------------------------


def test_vacuum_plan_nonvacuous_and_consistent(spark):
    """Both the retained and obsolete sets must be nonempty per lang at
    every SF (the fixed-byte-threshold first cut emptied one side or the
    other depending on SF), and the rollup must be internally consistent:
    retained + obsolete = pre, deletable + quarantined partition the
    obsolete bytes."""
    for sf in (SF_SMALL, SF_MEDIUM):
        for r in a5.layout_vacuum_plan(spark, sf).collect():
            assert r["n_obsolete"] > 0, (sf, r)
            assert r["n_retained"] > 0, (sf, r)
            assert r["n_retained"] + r["n_obsolete"] == r["n_files_pre"]
            assert 0 <= r["n_deletable"] <= r["n_obsolete"]
            assert r["bytes_reclaimed"] >= 0 and r["bytes_quarantined"] >= 0


def test_vacuum_retained_files_are_at_or_above_lang_mean(spark):
    """Replay the retained rule in DuckDB directly from the manifest and
    check the anti-join kept exactly the below-mean files."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_MEDIUM}/documents.parquet'"
    )
    want = con.sql(
        """
        WITH pre AS (
          SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS b
          FROM documents GROUP BY 1, 2),
        t AS (SELECT lang, COUNT(*) AS n, SUM(b) AS tot FROM pre GROUP BY 1)
        SELECT pre.lang, COUNT(*) FILTER (WHERE b * n < tot) AS n_obs
        FROM pre JOIN t USING (lang) GROUP BY 1
        """
    ).fetchall()
    got = {
        r["lang"]: r["n_obsolete"]
        for r in a5.layout_vacuum_plan(spark, SF_MEDIUM).collect()
    }
    assert got == {lang: n for lang, n in want}


# --------------------------------------------------------------------------
# sim_kmeans_lloyd invariants + partition invariance of all r11 operators
# --------------------------------------------------------------------------


def test_kmeans_cluster_accounting(spark):
    """Every cluster nonempty, sizes partition the corpus, the dominant
    label never exceeds its cluster, and the inertia is positive (a zero
    inertia would mean the quantization collapsed the space)."""
    from lua_mapreduce_spark.operators import analytics6 as a6

    got = a6.sim_kmeans_lloyd(spark, SF_MEDIUM).collect()
    assert len(got) == a6._KM_K
    con = duckdb.connect()
    n = con.sql(
        f"SELECT COUNT(*) FROM '{SF_MEDIUM}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_vecs"] for r in got) == n
    for r in got:
        assert r["n_vecs"] > 0
        assert 0 < r["n_dominant"] <= r["n_vecs"]
        assert r["inertia"] > 0


def test_r11_operators_partition_invariant(spark):
    """Physical-layout independence for the round-11 operators (the
    late-r10 convention): identical results under different shuffle
    parallelism."""
    from lua_mapreduce_spark.operators import analytics6 as a6
    from lua_mapreduce_spark.operators import dedup as _dd
    from lua_mapreduce_spark.operators import multimodal as _mm

    cases = {
        "refresh": r5.tpch_refresh_streams,
        "vacuum": a5.layout_vacuum_plan,
        "kmeans": a6.sim_kmeans_lloyd,
        "zonemap": a6.layout_zonemap_skipping,
        "vad": _mm.multimodal_audio_vad,
        "drift": a6.curation_filter_drift,
        "bbit": _dd.dedup_minhash_b_bit,
    }
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name, fn in cases.items():
                results[(name, parts)] = sorted(
                    tuple(r) for r in fn(spark, SF_SMALL).collect()
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for name in cases:
        assert results[(name, "3")] == results[(name, "17")], name
        assert results[(name, "3")], f"{name} vacuous"


def test_zonemap_soundness_and_contrast(spark):
    """Zone maps are SOUND (a skipped file can contain no matching row,
    so rows_scanned_ub >= rows_selected for every probe) and the layout
    contrast is real: the id-ordered layout must skip strictly more than
    the striped layout on the total."""
    from lua_mapreduce_spark.operators import analytics6 as a6

    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a6.layout_zonemap_skipping(spark, sf).collect()
        assert len(rows) == 2 * a6._ZM_PREDS
        skipped = {"ordered": 0, "striped": 0}
        for r in rows:
            assert r["rows_scanned_ub"] >= r["rows_selected"], (sf, r)
            assert 0 <= r["n_skipped"] <= r["n_files"]
            skipped[r["layout"]] += r["n_skipped"]
        assert skipped["ordered"] > skipped["striped"], (sf, skipped)


def test_vad_segmentation_mix_and_python_replay(spark):
    """The activity threshold must produce a REAL mix (documents with
    several segments AND inactive frames) at both parity SFs, and the
    mapInPandas loop must equal a direct Python replay over the raw
    bytes."""
    from lua_mapreduce_spark.operators import multimodal as mm

    for sf in (SF_SMALL, SF_MEDIUM):
        rows = {r["doc_id"]: r for r in mm.multimodal_audio_vad(spark, sf).collect()}
        assert any(r["n_segments"] >= 2 for r in rows.values()), sf
        assert any(
            r["n_active"] < r["n_frames"] for r in rows.values() if r["n_frames"]
        ), sf
        con = duckdb.connect()
        docs = con.sql(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet' LIMIT 50"
        ).fetchall()
        for doc_id, text in docs:
            sr, nf, na, ns, lr = mm._vad_segments(mm._encode_wav(text.encode()))
            r = rows[doc_id]
            assert (sr, nf, na, ns, lr) == (
                r["sample_rate"], r["n_frames"], r["n_active"],
                r["n_segments"], r["longest_run"],
            ), doc_id


def test_kmv_sketch_accuracy_and_structure(spark):
    """KMV estimates must sit within the family's statistical envelope
    (k=128 -> sd ~8.9%; allow 40% = >4 sigma — only a broken estimator
    trips this), exact counts must satisfy inclusion-exclusion, and both
    base sets must exceed K so the estimator path (not the exact-count
    fallback) is what the gate verifies."""
    from lua_mapreduce_spark.operators import analytics6 as a6

    for sf in (SF_SMALL, SF_MEDIUM):
        rows = {r["set_name"]: r for r in a6.agg_kmv_theta_sketch(spark, sf).collect()}
        assert set(rows) == {"urgent", "high_value", "union", "intersection"}
        for name, r in rows.items():
            assert r["err_permille"] <= 400, (sf, name, r)
        ex = {n: rows[n]["exact_n"] for n in rows}
        assert ex["union"] == ex["urgent"] + ex["high_value"] - ex["intersection"]
        assert ex["urgent"] > a6._KMV_K and ex["high_value"] > a6._KMV_K, sf


def test_filter_drift_shape_and_accounting(spark):
    """The drop must land where it aims: per-bin kept <= base everywhere,
    drops concentrate in the below-mean bins (the filter only ever drops
    below-mean docs, so the top bins lose NOTHING), the TVD is nonzero,
    and the bins partition the corpus."""
    import duckdb as _d
    from lua_mapreduce_spark.operators import analytics6 as a6

    for sf in (SF_SMALL, SF_MEDIUM):
        rows = sorted(
            a6.curation_filter_drift(spark, sf).collect(),
            key=lambda r: r["bin"],
        )
        assert len(rows) == a6._FD_BINS
        con = _d.connect()
        n = con.sql(
            f"SELECT COUNT(*) FROM '{sf}/documents.parquet'"
        ).fetchone()[0]
        assert sum(r["n_base"] for r in rows) == n
        assert all(0 <= r["n_after"] <= r["n_base"] for r in rows)
        assert rows[0]["tvd_permille"] > 0
        assert len({r["tvd_permille"] for r in rows}) == 1  # one total
        # everything at/above the mean survives: the top bin is untouched
        assert rows[-1]["n_dropped"] == 0, (sf, rows[-1])
        # and the drop mass sits strictly below the midpoint bins
        low = sum(r["n_dropped"] for r in rows[: a6._FD_BINS // 2])
        high = sum(r["n_dropped"] for r in rows[a6._FD_BINS // 2 :])
        assert low > high, (sf, low, high)


def test_streaming_kmv_multi_batch_and_bounds(spark):
    """The streaming sketch must accumulate across >= 3 real micro-batches
    (the drain convention), engage the ESTIMATOR path at the parity SF
    (every per-type distinct count exceeds K), and stay inside the KMV
    error envelope."""
    from lua_mapreduce_spark.operators import streaming_ops as so
    from lua_mapreduce_spark.streaming import stateful as st

    rows = so.streaming_kmv_distinct(spark, SF_MEDIUM).collect()
    assert st.LAST_DRAIN_NUM_BATCHES >= 3
    assert len(rows) == 5
    for r in rows:
        assert r["exact_distinct"] > st._KMV_SK, r  # estimator, not fallback
        assert r["err_permille"] <= 400, r


def test_b_bit_minhash_estimator_ladder(spark):
    """The three readings per candidate pair must behave like the theory
    says: mean absolute error of the full 32-slot estimate vs exact
    Jaccard stays inside the binomial envelope, the b-bit estimate is
    noisier but still tracks (its collision floor is corrected away),
    and all values live in [0, 1000]."""
    from lua_mapreduce_spark.operators import dedup as dd

    rows = dd.dedup_minhash_b_bit(spark, SF_MEDIUM).collect()
    assert rows, "no candidate pairs at parity SF"
    for r in rows:
        assert 0 <= r["jaccard_permille"] <= 1000
        assert 0 <= r["est_full_permille"] <= 1000
        assert 0 <= r["est_b_permille"] <= 1000
    mae_full = sum(
        abs(r["est_full_permille"] - r["jaccard_permille"]) for r in rows
    ) / len(rows)
    mae_b = sum(
        abs(r["est_b_permille"] - r["jaccard_permille"]) for r in rows
    ) / len(rows)
    # sd of the 32-slot binomial at J~0.9 is ~53 permille; the b-bit
    # variant adds collision-floor variance. These are 3x-headroom means.
    assert mae_full <= 160, mae_full
    assert mae_b <= 200, mae_b

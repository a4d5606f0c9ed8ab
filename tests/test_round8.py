"""Behavioral invariants for the round-8 wave (oracle parity is in
test_oracle_parity.py; these check semantics and bounds the value hash
can't see)."""

from __future__ import annotations

import itertools
import json
import os

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL


# ----------------------------------------------------- simhash pair join


def test_simhash_banding_is_lossless_vs_brute_force(spark):
    """The 4x12-bit banded join must find EVERY pair within the hamming
    threshold (pigeonhole guarantee) — compare against the brute-force
    all-pairs scan of the same fingerprints."""
    from lua_mapreduce_spark.operators.dedup import (
        _SHP_MAX_HAM,
        _simhash_wide,
    )

    fps = {r.doc_id: r.simhash for r in _simhash_wide(spark, SF_SMALL).collect()}
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= _SHP_MAX_HAM
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["dedup_simhash_pairs"](spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "fixture produced no near-dup pairs — test is vacuous"


def test_simhash_pairs_shuffle_carries_no_text(spark):
    """Only (doc_id, fingerprint) tuples may cross the band join — the
    text column must not survive past the tokenize scan."""
    import io
    import contextlib

    df = QUERIES["dedup_simhash_pairs"](spark, SF_MEDIUM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # text appears only in the scan's ReadSchema, never in an Exchange.
    # In formatted explain an Exchange's columns live on the Input:/
    # Arguments: lines of its "(N) Exchange" details block (never on the
    # line saying "Exchange"), so parse per-block, not per-line.
    import re

    blocks = re.split(r"(?m)^(?=\(\d+\) )", plan)
    exchange_blocks = [b for b in blocks if re.match(r"\(\d+\) Exchange", b)]
    assert exchange_blocks, "no Exchange details block found — parse broke"
    # parallelize_scan's RoundRobin small-file spread legitimately carries
    # the scan columns (a no-op at real scale, catalog.py:72); every
    # key-partitioned exchange (the band join / any agg) must not.
    keyed = [b for b in exchange_blocks if "RoundRobinPartitioning" not in b]
    assert keyed, "no key-partitioned Exchange found — parse broke"
    for block in keyed:
        assert "text" not in block, f"text column crossed a shuffle:\n{block}"


# --------------------------------------------- interval overlap (binned)


def test_interval_overlap_equals_direct_inequality_join(spark):
    """The bin rewrite must reproduce the direct (nested-loop) overlap
    join exactly — replayed here in Spark itself, independent of the
    DuckDB oracle."""
    from lua_mapreduce_spark.operators.scale_ops2 import (
        _OV_BURST_MIN,
        _OV_GAP_S,
    )
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn(
            "is_start",
            F.when(
                F.col("ts")
                > F.lag("ts").over(order_w) + F.expr(f"INTERVAL {_OV_GAP_S} SECONDS"),
                1,
            ).otherwise(F.when(F.lag("ts").over(order_w).isNull(), 1).otherwise(0)),
        )
        .withColumn("seq", F.sum("is_start").over(run_w))
        .groupBy("user_id", "seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    bursts = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("b_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.min("ts").alias("b_start"),
            F.max("ts").alias("b_end"),
        )
        .filter(F.col("n_errors") >= _OV_BURST_MIN)
    )
    direct = (
        sess.join(
            bursts,
            (F.col("s_start") <= F.col("b_end"))
            & (F.col("s_end") >= F.col("b_start")),
        )
        .groupBy(
            F.date_format("b_hour", "yyyy-MM-dd HH").alias("burst_hour"),
            "n_errors",
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions_hit"),
            F.countDistinct("user_id").alias("n_users_hit"),
        )
    )
    got = sorted(
        map(tuple, QUERIES["interval_overlap_join_binned"](spark, SF_SMALL).collect())
    )
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_interval_overlap_plan_is_equi_join(spark):
    """The whole point of the rewrite: the engine plan must be a hash/
    sort-merge EQUI-join on the bin, never a nested loop."""
    import io
    import contextlib

    df = QUERIES["interval_overlap_join_binned"](spark, SF_MEDIUM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ keyword extraction


def test_keyword_extraction_bounds_and_group_limit(spark):
    from lua_mapreduce_spark.operators.analytics2 import _KW_TOP

    rows = QUERIES["text_keyword_extraction"](spark, SF_SMALL).collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
        assert 1 <= r.rank <= _KW_TOP
        assert r.tf >= 1 and r.df >= 1
        assert r.score_milli == (1000 * r.tf * n_docs) // r.df
    assert len(per_doc) == n_docs  # every doc gets keywords
    for doc_rows in per_doc.values():
        assert len(doc_rows) <= _KW_TOP
        ranks = sorted(r.rank for r in doc_rows)
        assert ranks == list(range(1, len(doc_rows) + 1))
    # the per-doc frontier must compile to WindowGroupLimit (map-side cap)
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["text_keyword_extraction"](spark, SF_MEDIUM).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


# ----------------------------------------------------------- RFM segments


def test_rfm_segments_conserve_users_and_cents(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    rows = QUERIES["events_rfm_segments"](spark, SF_SMALL).collect()
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()
    total_cents = ev.select(
        F.expr("CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)").alias("c")
    ).collect()[0].c
    assert sum(r.sum_cents for r in rows) == total_cents
    # output bounded by the log-bucket cube, not the user count
    assert len(rows) < 16**2


# ------------------------------------------------------ as-of tolerance


def test_asof_tolerance_subset_of_unbounded_attribution(spark):
    """Tolerance attribution must agree with the unbounded as-of join
    wherever it attributes, and only ever REMOVE attributions."""
    unbounded = {
        r.purchase_id: r.last_touch_id
        for r in QUERIES["asof_join_attribution"](spark, SF_SMALL).collect()
    }
    rows = QUERIES["asof_join_tolerance"](spark, SF_SMALL).collect()
    assert len(rows) == len(unbounded)
    n_dropped = 0
    for r in rows:
        if r.is_attributed:
            assert r.attributed_touch_id == unbounded[r.purchase_id]
        else:
            assert r.attributed_touch_id is None
            n_dropped += 1
    # the bound actually bites on this data (otherwise the test is vacuous)
    assert n_dropped > 0


# ------------------------------------------------------- shard manifest


def test_shard_manifest_query_matches_written_manifest(spark, tmp_path):
    """The registered query face and the _manifest.json sidecar must
    describe the same export."""
    from lua_mapreduce_spark.operators.curation import (
        _EXPORT_SHARDS,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out)
    with open(os.path.join(out, "_manifest.json")) as fh:
        sidecar = {int(k): v for k, v in json.load(fh).items()}
    assert manifest == sidecar
    assert set(manifest) <= set(range(_EXPORT_SHARDS))
    got = {
        r.shard: (r.n_rows, r.n_bytes)
        for r in QUERIES["curation_shard_manifest"](spark, SF_SMALL).collect()
    }
    assert got == {
        s: (m["rows"], m["bytes"]) for s, m in manifest.items()
    }


# ------------------------------------------------------- source faces


def test_xml_roundtrip_preserves_row_count(spark):
    rows = QUERIES["source_xml_roundtrip"](spark, SF_SMALL).collect()
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert sum(r.n_customers for r in rows) == n_cust


def test_variant_extract_matches_string_extraction(spark):
    """The binary VARIANT path must agree with plain get_json_object."""
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    want = (
        ev.select(
            F.expr(
                "CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10"
            ).alias("k_decade")
        )
        .groupBy("k_decade")
        .count()
    )
    want_map = {r.k_decade: r["count"] for r in want.collect()}
    got = QUERIES["source_variant_extract"](spark, SF_SMALL).collect()
    assert {r.k_decade: r.n_events for r in got} == want_map

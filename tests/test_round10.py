"""Round-10 behavioral tests: recursive-CTE BFS twin, A-ES weighted
reservoir sampling, crawl-frontier dedup."""

from __future__ import annotations

import io
import math
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from lua_mapreduce_spark.operators import QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------- recursive-CTE BFS twin


def test_bfs_recursive_cte_equals_iterative(spark):
    """The declarative WITH RECURSIVE form and the driver-side frontier
    loop must produce identical level profiles — they share one oracle,
    but this pins them against EACH OTHER at a second SF too."""
    for sf in (SF_SMALL, SF_MEDIUM):
        a = sorted(
            map(tuple, QUERIES["graph_bfs_distances"](spark, sf).collect())
        )
        b = sorted(
            map(tuple, QUERIES["graph_bfs_recursive_cte"](spark, sf).collect())
        )
        assert a == b, f"BFS forms diverge at {sf}"


# ------------------------------------------------- A-ES weighted sampling


def _aes_python_selection(spark, sf_dir):
    """Replay A-ES in plain Python (hashlib md5 + math.log): the ground
    truth both engines must reproduce."""
    import hashlib

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    keyed = []
    for r in rows:
        h = int(
            hashlib.md5(f"order-{r.o_orderkey}".encode()).hexdigest()[:15], 16
        )
        w = round(r.o_totalprice * 100)
        e = -math.log((h + 0.5) / float(1 << 60)) / w
        keyed.append((e, r.o_orderkey, w))
    keyed.sort()
    return keyed


def test_aes_matches_python_replay(spark):
    got = {
        r.o_orderkey
        for r in QUERIES["curation_weighted_sample_aes"](
            spark, SF_MEDIUM
        ).collect()
    }
    keyed = _aes_python_selection(spark, SF_MEDIUM)
    want = {k for _, k, _ in keyed[:100]}
    assert got == want


def test_aes_boundary_margin_dwarfs_float_noise(spark):
    """The only cross-engine float sensitivity is the ORDER at the k-th
    boundary: assert the e-key gap there is many orders of magnitude
    above last-ulp libm divergence (~1e-16 relative)."""
    keyed = _aes_python_selection(spark, SF_MEDIUM)
    ek, ek1 = keyed[99][0], keyed[100][0]
    assert (ek1 - ek) / ek1 > 1e-9


def test_aes_is_weighted_not_uniform(spark):
    """Inclusion must actually follow the weights: the selected rows'
    mean weight exceeds the population mean (A-ES draws
    proportional-to-size), and selection differs from the unweighted
    top-k-by-hash draw (non-vacuity of the /w term)."""
    df = QUERIES["curation_weighted_sample_aes"](spark, SF_MEDIUM)
    sel = [(r.o_orderkey, r.weight_cents) for r in df.collect()]
    pop = (
        spark.read.parquet(f"{SF_MEDIUM}/orders.parquet")
        .select(F.expr("round(o_totalprice * 100.0)").alias("w"))
        .agg(F.avg("w"))
        .collect()[0][0]
    )
    mean_sel = sum(w for _, w in sel) / len(sel)
    assert mean_sel > pop
    import hashlib

    uniform = {
        r.o_orderkey
        for r in sorted(
            spark.read.parquet(f"{SF_MEDIUM}/orders.parquet")
            .select("o_orderkey")
            .collect(),
            key=lambda r: int(
                hashlib.md5(f"order-{r.o_orderkey}".encode()).hexdigest()[:15],
                16,
            ),
        )[:100]
    }
    assert {k for k, _ in sel} != uniform


def test_aes_plan_is_per_partition_topk(spark):
    """k-row selection must compile to TakeOrderedAndProject (partition
    heaps + driver merge), never a global Sort of the data."""
    plan = _plan(QUERIES["curation_weighted_sample_aes"](spark, SF_MEDIUM))
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- crawl-frontier dedup


def _canon_py(doc_id: int, source: str) -> str:
    url = "https://"
    url += "WWW." if doc_id % 3 == 0 else ("www." if doc_id % 3 == 1 else "")
    url += (source.upper() if doc_id % 2 == 0 else source) + ".example.com"
    url += f"/page/{doc_id % 100}"
    if doc_id % 7 == 0:
        url += "/"
    if doc_id % 4 == 0:
        url += "?utm_source=feed"
    elif doc_id % 4 == 1:
        url += "#section-2"
    url = url.split("#")[0].split("?")[0].lower()
    url = url.replace("://www.", "://")
    return url.rstrip("/")


def test_crawl_frontier_matches_python_replay(spark):
    docs = (
        spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    latest: dict[str, int] = {}
    for r in docs:
        c = _canon_py(r.doc_id, r.source)
        latest[c] = max(latest.get(c, -1), r.doc_id)
    want: dict[str, list[int]] = {}
    for c, seq in latest.items():
        d = c.split("/")[2]
        agg = want.setdefault(d, [0, 0, 0, 10**9, -1])
        agg[0] += 1
        agg[1] += seq
        agg[2] = max(agg[2], seq)
        agg[3] = min(agg[3], len(c))
        agg[4] = max(agg[4], len(c))
    got = {
        r.domain: [
            r.n_pages,
            r.kept_checksum,
            r.latest_fetch,
            r.min_url_len,
            r.max_url_len,
        ]
        for r in QUERIES["dedup_crawl_frontier"](spark, SF_MEDIUM).collect()
    }
    assert got == want
    # canonicalization actually collapses fetches (non-vacuous: several
    # raw variants per page)
    assert sum(v[0] for v in want.values()) < len(docs)


def test_crawl_frontier_keep_latest_is_map_side(spark):
    """rn=1 over (canon_url, fetch_seq DESC) must compile to
    WindowGroupLimit so per-key runs truncate before the exchange."""
    plan = _plan(QUERIES["dedup_crawl_frontier"](spark, SF_MEDIUM))
    assert "WindowGroupLimit" in plan

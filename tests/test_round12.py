"""Round-12 operator tests: Kosaraju SCC (with a pure-Python Tarjan
replay), the AMS/tug-of-war F2 sketch, the rank-sum evaluators
(Mann-Whitney AUC, Cohen's kappa), and the per-file Bloom skipping
index."""

from __future__ import annotations

import duckdb

from lua_mapreduce_spark.operators import analytics7 as a7
from tests.conftest import SF_MEDIUM, SF_SMALL


# --------------------------------------------------------------------------
# graph_scc_kosaraju
# --------------------------------------------------------------------------


def _tarjan_sccs(edges: list[tuple[str, str]]) -> dict[str, frozenset[str]]:
    """Iterative Tarjan over the collected edge list — an INDEPENDENT
    algorithm (single DFS + lowlink) replaying the operator's two-pass
    Kosaraju result, the graph-family convention (the r10 closure's
    Python-BFS replay)."""
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    comp: dict[str, frozenset[str]] = {}
    counter = [0]

    def strongconnect(v0: str) -> None:
        work = [(v0, iter(adj.get(v0, ())))]
        index[v0] = low[v0] = counter[0]
        counter[0] += 1
        stack.append(v0)
        on_stack.add(v0)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                fs = frozenset(members)
                for m in members:
                    comp[m] = fs

    for n in sorted(nodes):
        if n not in index:
            strongconnect(n)
    return comp


def test_scc_matches_tarjan_replay(spark):
    """The Spark SCC partition must equal an independent Tarjan run over
    the same collected edges, at both parity scale factors."""
    for sf in (SF_SMALL, SF_MEDIUM):
        edges = [
            (r["src"], r["dst"]) for r in a7._scc_edges(spark, sf).collect()
        ]
        expect = _tarjan_sccs(edges)
        got = a7.graph_scc_kosaraju(spark, sf).collect()
        by_id: dict[str, set[str]] = {}
        for r in got:
            by_id.setdefault(r["scc_id"], set()).add(r["node"])
        for r in got:
            assert frozenset(by_id[r["scc_id"]]) == expect[r["node"]], (
                sf,
                r["node"],
            )
            assert r["scc_size"] == len(expect[r["node"]])


def test_scc_canonical_ids_and_partition(spark):
    """Structural invariants: scc_id is the MIN member of its component,
    the id is itself a node assigned to that same component, and the
    component sizes sum to the node count (a partition, no overlap)."""
    rows = a7.graph_scc_kosaraju(spark, SF_SMALL).collect()
    by_id: dict[str, set[str]] = {}
    for r in rows:
        by_id.setdefault(r["scc_id"], set()).add(r["node"])
    assign = {r["node"]: r["scc_id"] for r in rows}
    for cid, members in by_id.items():
        assert cid == min(members)
        assert assign[cid] == cid
    assert sum(len(m) for m in by_id.values()) == len(rows)


def test_scc_has_nontrivial_component(spark):
    """The trade graph's top-2 sparsifier must leave at least one real
    cycle — a size>1 SCC — at both parity SFs, or the operator would be
    vacuously green on an acyclic graph."""
    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a7.graph_scc_kosaraju(spark, sf).collect()
        assert any(r["scc_size"] > 1 for r in rows), sf


def test_scc_squared_steps_cover_edges(spark):
    """The pre-squared step relation must contain every raw edge and only
    pairs reachable in <=4 hops (spot-checked via the replayed closure)."""
    edges = [(r["src"], r["dst"]) for r in a7._scc_edges(spark, SF_SMALL).collect()]
    s4 = {
        (r["src"], r["dst"])
        for r in a7._square_steps(
            a7._square_steps(a7._scc_edges(spark, SF_SMALL))
        ).collect()
    }
    assert set(edges) <= s4
    # replay <=4-hop reachability (loop-free pairs) in Python
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    reach = {(s, d) for s, d in edges}
    frontier = dict(adj)
    cur = {s: set(ds) for s, ds in adj.items()}
    for _ in range(3):
        nxt: dict[str, set[str]] = {}
        for s, mids in cur.items():
            for m in mids:
                for d in adj.get(m, ()):  # extend one hop
                    if d != s:
                        nxt.setdefault(s, set()).add(d)
                        reach.add((s, d))
        cur = nxt
    assert s4 == reach


# --------------------------------------------------------------------------
# agg_ams_f2_sketch
# --------------------------------------------------------------------------


def test_ams_exact_f2_is_self_join_size(spark):
    """f2_exact must equal the true self-join size |events ⋈ events| on
    user_id, computed independently in DuckDB."""
    for sf in (SF_SMALL, SF_MEDIUM):
        row = a7.agg_ams_f2_sketch(spark, sf).collect()[0]
        con = duckdb.connect()
        truth = con.execute(
            f"SELECT COUNT(*) FROM '{sf}/events.parquet' a"
            f" JOIN '{sf}/events.parquet' b USING (user_id)"
        ).fetchone()[0]
        assert row["f2_exact"] == truth, sf


def test_ams_median_of_means_selection(spark):
    """f2_est must be the lower median (3rd smallest of 5) of the group
    means — the estimator's defining selection rule."""
    rows = a7.agg_ams_f2_sketch(spark, SF_MEDIUM).collect()
    assert len(rows) == a7._AMS_R // a7._AMS_G == 5
    means = sorted(r["mean_x2"] for r in rows)
    assert rows[0]["f2_est"] == means[2]


def test_ams_estimate_accuracy(spark):
    """Median-of-means over 40 sign-hash estimators should land within
    2x of exact F2 at both parity SFs (observed 102 and 309 permille;
    the bound is generous because it gates a RANDOMIZED estimator's
    deterministic md5 instantiation, not a tunable)."""
    for sf in (SF_SMALL, SF_MEDIUM):
        row = a7.agg_ams_f2_sketch(spark, sf).collect()[0]
        assert row["err_permille"] is not None and row["err_permille"] < 1000, (
            sf,
            row,
        )


# --------------------------------------------------------------------------
# curation_quality_auc / curation_label_agreement
# --------------------------------------------------------------------------


def test_auc_replay_pairwise(spark):
    """The histogram rank-sum AUC must equal the O(n^2) pairwise
    definition replayed in Python over the labeled rows at sf0.001:
    U2 = 2*#(pos above neg) + #(ties)."""
    sf = SF_SMALL
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, CAST(n_chars AS BIGINT) FROM"
        f" '{sf}/documents.parquet'"
    ).fetchall()
    import hashlib

    by_lang: dict[str, list[tuple[int, bool]]] = {}
    stats: dict[str, tuple[int, int]] = {}
    for _, lang, n in docs:
        c, t = stats.get(lang, (0, 0))
        stats[lang] = (c + 1, t + n)
    for doc_id, lang, n in docs:
        h = int(hashlib.md5(f"auc-{doc_id}".encode()).hexdigest()[:15], 16)
        n_l, total_l = stats[lang]
        pos = (n + h % a7._EVAL_NOISE - a7._EVAL_NOISE // 2) * n_l > total_l
        by_lang.setdefault(lang, []).append((n, pos))
    got = {r["lang"]: r for r in a7.curation_quality_auc(spark, sf).collect()}
    for lang, rows in by_lang.items():
        pos_scores = [s for s, p in rows if p]
        neg_scores = [s for s, p in rows if not p]
        u2 = sum(
            2 if ps > ns else (1 if ps == ns else 0)
            for ps in pos_scores
            for ns in neg_scores
        )
        r = got[lang]
        assert (r["n_pos"], r["n_neg"], r["u2"]) == (
            len(pos_scores),
            len(neg_scores),
            u2,
        ), lang
        assert r["auc_permille"] == 1000 * u2 // (
            2 * len(pos_scores) * len(neg_scores)
        )


def test_auc_score_ranks_well(spark):
    """The length score must genuinely rank the noisy length-derived
    label — AUC well above the 500-permille coin-flip line but below
    1000 (the noise keeps it off the degenerate perfect-separation
    case) for every lang at both parity SFs."""
    for sf in (SF_SMALL, SF_MEDIUM):
        for r in a7.curation_quality_auc(spark, sf).collect():
            assert 700 <= r["auc_permille"] < 1000, (sf, r)


def test_kappa_beats_chance_but_not_perfect(spark):
    """Two noisy gates over the same signal must agree beyond chance
    (kappa >> 0) without being identical (kappa < 1000) — and the
    permille value must replay from the row's own counts."""
    for sf in (SF_SMALL, SF_MEDIUM):
        for r in a7.curation_label_agreement(spark, sf).collect():
            assert 300 <= r["kappa_permille"] < 1000, (sf, r)
            n, a, b, agree = (
                r["n_docs"],
                r["a_pos"],
                r["b_pos"],
                r["n_agree"],
            )
            e = a * b + (n - a) * (n - b)
            num = 1000 * (n * agree - e)
            den = n * n - e
            # both engines truncate toward zero; num >= 0 here
            assert r["kappa_permille"] == num // den, (sf, r)


# --------------------------------------------------------------------------
# layout_bloom_file_index
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """The Bloom structural guarantee: every file that truly contains a
    probe key must be hit by the index (n_files_hit >= n_files_true),
    and every PRESENT probe finds at least its own file."""
    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a7.layout_bloom_file_index(spark, sf).collect()
        assert rows
        for r in rows:
            assert r["n_files_hit"] >= r["n_files_true"], (sf, r)
            assert r["n_false_pos"] >= 0
            assert r["n_files_hit"] + r["n_files_skipped"] == a7._BLM_FILES
            if r["present"]:
                assert r["n_files_true"] >= 1, (sf, r)
            else:
                assert r["n_files_true"] == 0, (sf, r)


def test_streaming_countmin_structural_guarantee(spark):
    """The CM sketch's defining property, per probe: est >= exact (a
    counter only ever ABSORBS other keys' increments), with equality for
    most probes at this width — and the probe set must be nonempty with
    every exact count positive (probes are drawn from existing events)."""
    from lua_mapreduce_spark.operators import streaming_ops as so

    rows = so.streaming_countmin_totals(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["exact_n"] >= 1, r
        assert r["est_n"] >= r["exact_n"], r
        assert r["overcount"] == r["est_n"] - r["exact_n"]


def test_streaming_countmin_ran_multiple_batches(spark):
    """The state must genuinely accumulate across >= 3 micro-batches
    (the time-split file source trickles one file per trigger)."""
    from lua_mapreduce_spark.operators import streaming_ops as so
    from lua_mapreduce_spark.streaming import stateful

    so.streaming_countmin_totals(spark, SF_SMALL).collect()
    assert stateful.LAST_DRAIN_NUM_BATCHES >= 3


def test_bloom_workload_is_balanced_and_skips(spark):
    """The probe workload carries present/absent twins in equal number,
    and the index actually skips files (mean skip > half the layout) —
    the quantified point of building it."""
    rows = a7.layout_bloom_file_index(spark, SF_MEDIUM).collect()
    n_present = sum(1 for r in rows if r["present"])
    assert n_present * 2 == len(rows)
    avg_skip = sum(r["n_files_skipped"] for r in rows) / len(rows)
    assert avg_skip > a7._BLM_FILES / 2, avg_skip

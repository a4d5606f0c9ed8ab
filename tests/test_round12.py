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


def test_nsw_truth_labels_and_recall(spark):
    """sim_knn_graph_search invariants: the in_true verdicts must match
    an independent brute-force top-K replayed in DuckDB, found_dist must
    be non-decreasing in rank per query, and recall@5 must clear a
    floor just below the measured values (24/25 and 23/25 at the parity
    SFs — floor 20, tight enough that a broken symmetrization or a
    halved-recall regression fails instead of coasting)."""
    from lua_mapreduce_spark.operators.analytics6 import _KM_SCALE

    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a7.sim_knn_graph_search(spark, sf).collect()
        assert len(rows) == a7._NSW_Q * a7._NSW_K
        con = duckdb.connect()
        import math

        def quant(v):
            return [int(math.floor(float(x) * _KM_SCALE + 0.5)) for x in v]

        raw = con.execute(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
        grid = {vid: quant(v) for vid, v in raw}
        truth = {}
        for qid in range(a7._NSW_Q):
            qv = grid[qid]
            scored = sorted(
                (
                    (sum((a - b) * (a - b) for a, b in zip(qv, grid[v])), v)
                    for v in grid
                    if v != qid
                ),
            )[: a7._NSW_K]
            truth[qid] = {v for _, v in scored}
        by_q: dict[int, list] = {}
        n_hits = 0
        for r in rows:
            assert r["in_true"] == (r["found_id"] in truth[r["query_id"]]), (
                sf,
                r,
            )
            n_hits += r["in_true"]
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["found_dist"])
            )
        for qid, rs in by_q.items():
            ds = [d for _, d in sorted(rs)]
            assert all(a <= b for a, b in zip(ds, ds[1:])), (sf, qid)
        assert n_hits >= 20, (sf, n_hits)


def test_streaming_cusum_equals_batch(spark):
    """The streaming CUSUM monitor (stream-aggregated hourly state ->
    shared cusum_argmax tail) must produce EXACTLY the batch
    events_changepoint_cusum rows — same change point, same level
    estimates — at both parity SFs."""
    from lua_mapreduce_spark.operators import streaming_ops as so

    for sf in (SF_SMALL, SF_MEDIUM):
        batch = {
            r["event_type"]: tuple(r)
            for r in a7.events_changepoint_cusum(spark, sf).collect()
        }
        streamed = {
            r["event_type"]: tuple(r)
            for r in so.streaming_cusum_monitor(spark, sf).collect()
        }
        assert streamed == batch, sf


def test_closeness_matches_bfs_replay(spark):
    """Harmonic centrality must equal a pure-Python BFS replay (hop
    distances bounded at _CC_HOPS) over the collected edges, per node,
    at both parity SFs."""
    from collections import deque

    for sf in (SF_SMALL, SF_MEDIUM):
        edges = [
            (r["src"], r["dst"]) for r in a7._scc_edges(spark, sf).collect()
        ]
        adj: dict[str, list[str]] = {}
        nodes = set()
        for s, d in edges:
            adj.setdefault(s, []).append(d)
            nodes.add(s)
            nodes.add(d)
        got = {
            r["node"]: (r["n_reached"], r["harmonic_permille"])
            for r in a7.graph_closeness_centrality(spark, sf).collect()
        }
        assert set(got) == nodes, sf
        for u in nodes:
            dist = {u: 0}
            dq = deque([u])
            while dq:
                x = dq.popleft()
                if dist[x] >= a7._CC_HOPS:
                    continue
                for y in adj.get(x, ()):
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        dq.append(y)
            reach = {v: h for v, h in dist.items() if v != u and h >= 1}
            h_sum = sum(1000 // h for h in reach.values())
            assert got[u] == (len(reach), h_sum), (sf, u)


def test_hnsw_recall_and_shape(spark):
    """sim_hnsw_layers invariants: full 5x5 result, per-query distances
    non-decreasing in rank, self never reported, recall@5 clears a
    floor just below the measured values (23/25 and 21-24/25 at the
    parity SFs — floor 20), AND the hierarchy's recall stays within a
    small slack of the flat NSW query's measured in the same run — the
    routing claim (ONE descent entry replacing 32 spread entries)
    pinned as a relative gate, not just an absolute floor."""
    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a7.sim_hnsw_layers(spark, sf).collect()
        assert len(rows) == a7._NSW_Q * a7._NSW_K
        by_q: dict[int, list] = {}
        n_hits = 0
        for r in rows:
            assert r["found_id"] != r["query_id"], (sf, r)
            n_hits += r["in_true"]
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["found_dist"])
            )
        for qid, rs in by_q.items():
            ds = [d for _, d in sorted(rs)]
            assert all(a <= b for a, b in zip(ds, ds[1:])), (sf, qid)
        assert n_hits >= 20, (sf, n_hits)
        flat_hits = sum(
            r["in_true"] for r in a7.sim_knn_graph_search(spark, sf).collect()
        )
        assert n_hits >= flat_hits - 3, (sf, n_hits, flat_hits)


def test_hnsw_levels_are_nested_and_populated(spark):
    """The level MODULI must keep the layers nested (L2_MOD a multiple
    of L1_MOD — the structural invariant a careless constant change
    would break), and the md5 assignment must populate both upper
    layers non-degenerately at the parity SF."""
    import hashlib

    # nesting is a CONSTANT property: h % L2 == 0 implies h % L1 == 0
    # for every h exactly when L1 divides L2 — pin the divisibility
    assert a7._HNSW_L2_MOD % a7._HNSW_L1_MOD == 0
    assert a7._HNSW_L2_MOD > a7._HNSW_L1_MOD > 1
    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM '{SF_MEDIUM}/embeddings.parquet'"
        ).fetchall()
    ]
    lvl = {
        v: int(hashlib.md5(f"hnsw-l-{v}".encode()).hexdigest()[:15], 16)
        for v in ids
    }
    n1 = sum(1 for h in lvl.values() if h % a7._HNSW_L1_MOD == 0)
    n2 = sum(1 for h in lvl.values() if h % a7._HNSW_L2_MOD == 0)
    assert 0 < n2 < n1 < len(ids)


def test_mst_matches_kruskal_replay(spark):
    """The minimax-closure membership must pick exactly the tree an
    independent pure-Python KRUSKAL (union-find over edges ranked
    heaviest-first) picks, at both parity SFs — and the chosen edge
    count must equal n_nodes - n_components (a spanning forest)."""
    for sf in (SF_SMALL, SF_MEDIUM):
        rows = a7.graph_mst_maximum_spanning(spark, sf).collect()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = {r["src"] for r in rows} | {r["dst"] for r in rows}
        for n in nodes:
            parent[n] = n
        chosen = set()
        for r in sorted(rows, key=lambda r: r["rank"]):
            ru, rv = find(r["src"]), find(r["dst"])
            if ru != rv:
                parent[ru] = rv
                chosen.add((r["src"], r["dst"]))
        got = {(r["src"], r["dst"]) for r in rows if r["in_mst"]}
        assert got == chosen, sf
        n_components = len({find(n) for n in nodes})
        assert len(got) == len(nodes) - n_components, sf


def test_mst_bottleneck_closure_properties(spark):
    """Closure invariants: every edge's pair bottleneck is <= its own
    rank (the edge itself is a path), and in_mst holds exactly when
    they are equal."""
    rows = a7.graph_mst_maximum_spanning(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["bottleneck"] <= r["rank"], r
        assert r["in_mst"] == (r["bottleneck"] == r["rank"]), r


def test_cusum_matches_python_replay(spark):
    """The detected change point must equal a pure-Python replay of the
    scaled CUSUM argmax (earliest-k tiebreak) over the DuckDB hourly
    counts, per event type at both parity SFs."""
    for sf in (SF_SMALL, SF_MEDIUM):
        con = duckdb.connect()
        rows = con.execute(
            "SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT), COUNT(*)"
            f" FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
        ).fetchall()
        series: dict[str, list[tuple[int, int]]] = {}
        for et, hr, x in rows:
            series.setdefault(et, []).append((hr, x))
        got = {
            r["event_type"]: r
            for r in a7.events_changepoint_cusum(spark, sf).collect()
        }
        for et, pts in series.items():
            s = sum(x for _, x in pts)
            n = len(pts)
            best = None
            cum = 0
            for k, (hr, x) in enumerate(pts, start=1):
                cum += x
                c_abs = abs(n * cum - k * s)
                if best is None or c_abs > best[0]:
                    best = (c_abs, k, hr, cum)
            r = got[et]
            assert (r["cusum_abs"], r["k"], r["change_hr"]) == best[:3], (
                sf,
                et,
            )
            assert r["mean_before_x1000"] == 1000 * best[3] // best[1]
            assert r["n_hours"] == n


def test_skyline_matches_definitional_dominance(spark):
    """The sweep-line skyline must equal the O(n^2) dominance definition
    replayed in Python, and along the frontier diversity must strictly
    decrease as length increases (the 2-D skyline shape invariant)."""
    import hashlib  # noqa: F401  (parallel structure with other replays)
    import re

    for sf in (SF_SMALL, SF_MEDIUM):
        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text, CAST(n_chars AS BIGINT) FROM"
            f" '{sf}/documents.parquet'"
        ).fetchall()
        pts = []
        for doc_id, text, c in docs:
            words = [w.lower() for w in re.findall(r"[A-Za-z]+", text)]
            u = 1000 * len(set(words)) // len(words)
            pts.append((doc_id, c, u))
        expect = {
            (d, c, u)
            for d, c, u in pts
            if not any(
                bc >= c and bu >= u and (bc > c or bu > u)
                for _, bc, bu in pts
            )
        }
        got = {
            (r["doc_id"], r["n_chars"], r["uniq_permille"])
            for r in a7.curation_pareto_skyline(spark, sf).collect()
        }
        assert got == expect, sf
        assert got
        # distinct-length frontier points: u strictly decreases in c
        by_c: dict[int, int] = {}
        for _, c, u in got:
            by_c[c] = u
        ordered = [u for _, u in sorted(by_c.items())]
        assert all(a > b for a, b in zip(ordered, ordered[1:]))


def test_bloom_workload_is_balanced_and_skips(spark):
    """The probe workload carries present/absent twins in equal number,
    and the index actually skips files (mean skip > half the layout) —
    the quantified point of building it."""
    rows = a7.layout_bloom_file_index(spark, SF_MEDIUM).collect()
    n_present = sum(1 for r in rows if r["present"])
    assert n_present * 2 == len(rows)
    avg_skip = sum(r["n_files_skipped"] for r in rows) / len(rows)
    assert avg_skip > a7._BLM_FILES / 2, avg_skip

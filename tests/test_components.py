"""Connected components (large-star/small-star) — property tests.

The driver-facing query `dedup_cluster_components` gets full value-level
oracle parity in tests/test_oracle_parity.py; these tests exercise the
`connected_components` helper directly on adversarial graph shapes the
MinHash pair graph at sf0.01 doesn't produce:

* a path far longer than the old label-propagation cap (the shape that
  used to raise RuntimeError after 20 iterations),
* a celebrity star (the skew case large-star exists for),
* random graphs checked against a pure-Python union-find oracle.
"""

import random

import pytest

from lua_mapreduce_spark.operators.pipeline import (
    _MAX_STAR_ROUNDS,
    connected_components,
)

pytestmark = pytest.mark.usefixtures("spark")


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    return {r.doc_id: r.cluster_id for r in connected_components(df).collect()}


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_long_chain_converges(spark):
    """A 200-hop path: min-label propagation needed ~200 rounds (> its old
    cap of 20, i.e. RuntimeError); star rounds need ~log2(200) ≈ 8."""
    n = 200
    pairs = [(i, i + 1) for i in range(n)]
    labels = _labels(spark, pairs)
    assert labels == {i: 0 for i in range(n + 1)}


def test_celebrity_star_and_two_components(spark):
    star = [(1000, i) for i in range(1, 500)]  # hot vertex, degree 499
    chain = [(2000 + i, 2001 + i) for i in range(10)]
    labels = _labels(spark, star + chain)
    assert labels[1000] == 1
    assert all(labels[i] == 1 for i in range(1, 500))
    assert all(labels[2000 + i] == 2000 for i in range(11))


def test_random_graphs_match_union_find(spark):
    rng = random.Random(41)
    for _ in range(3):
        nodes = list(range(rng.randrange(30, 80)))
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(len(nodes) * 2)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _labels(spark, pairs) == _union_find_oracle(pairs)


def test_self_pairs_only_graph_is_empty(spark):
    labels = _labels(spark, [(7, 7), (9, 9)])
    assert labels == {}


def test_round_cap_is_generous(spark):
    # Convergence of the 200-path must leave plenty of cap headroom: if a
    # refactor silently degrades the round complexity back to O(diameter),
    # this fails before the cap RuntimeError would fire in production.
    assert _MAX_STAR_ROUNDS >= 30

"""T61 synchronous LPA (operators/lpa.py) vs an independent Python
round simulator, plus structural community pins."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from warcsum_spark.operators.lpa import label_propagation


def _ref_lpa(edges, iters=5):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        labels = new
    return labels


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_two_cliques_with_bridge(spark):
    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = cl1 + cl2 + [(3, 10)]  # one weak bridge
    out = {r.node: r.label for r in label_propagation(_df(spark, edges)).collect()}
    assert len({out[n] for n in range(4)}) == 1
    assert len({out[n] for n in range(10, 14)}) == 1
    assert out[0] != out[13]  # the bridge does not merge the cliques


def test_matches_reference_random_graph(spark):
    rng = np.random.RandomState(5)
    edges = [
        (int(rng.randint(0, 40)), int(rng.randint(0, 40))) for _ in range(150)
    ]
    got = {r.node: r.label for r in label_propagation(_df(spark, edges)).collect()}
    want = _ref_lpa(edges)
    assert got == want


def test_duplicate_and_self_edges_ignored(spark):
    edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3)]
    a = {r.node: r.label for r in label_propagation(_df(spark, edges)).collect()}
    b = {r.node: r.label for r in label_propagation(_df(spark, [(1, 2), (2, 3)])).collect()}
    assert a == b

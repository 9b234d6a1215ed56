"""T65 — triangle counting: degree-ordered node-iterator vs a
brute-force pure-Python reference, clique/path pins, duplicate-edge
and self-loop collapse, and the global count."""

from __future__ import annotations

from itertools import combinations

import pytest

from warcsum_spark.operators.triangles import (
    global_triangle_count,
    triangle_counts,
)


def _brute(edges: list[tuple[int, int]]) -> dict[int, tuple[int, int, float]]:
    """node -> (degree, triangles, clustering) by direct enumeration."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    out = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        cc = round(2.0 * tri[n] / (d * (d - 1)), 6) if d >= 2 else 0.0
        out[n] = (d, tri[n], cc)
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: (r.degree, r.triangles, r.clustering)
        for r in triangle_counts(df).collect()
    }


def test_clique_k5(spark):
    edges = [(a, b) for a, b in combinations(range(5), 2)]
    got = _run(spark, edges)
    assert got == {n: (4, 6, 1.0) for n in range(5)}


def test_path_has_no_triangles(spark):
    got = _run(spark, [(i, i + 1) for i in range(6)])
    assert all(t == 0 and c == 0.0 for (_, t, c) in got.values())
    assert got[0][0] == 1 and got[3][0] == 2


def test_duplicate_and_self_edges_collapse(spark):
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (2, 2), (1, 1)]
    got = _run(spark, edges)
    assert got == _brute(edges)
    assert got[0] == (2, 1, 1.0)


def test_random_graph_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    edges = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(160)
    ]
    assert _run(spark, edges) == _brute(edges)


def test_global_count(spark):
    edges = [(a, b) for a, b in combinations(range(6), 2)]  # K6: C(6,3)=20
    df = spark.createDataFrame(edges, "src long, dst long")
    assert global_triangle_count(df).collect()[0].n_triangles == 20


def test_hub_out_degree_bounded(spark):
    """Star + one rim edge: the hub has degree n but orientation gives
    it NO out-edges (all point away from the low-degree rim into it is
    false — rim nodes point INTO the hub), so wedges at the hub never
    explode. Counted result still exact."""
    n = 40
    edges = [(0, i) for i in range(1, n)] + [(1, 2)]
    got = _run(spark, edges)
    assert got == _brute(edges)
    assert got[0][1] == 1  # the single rim edge closes one triangle

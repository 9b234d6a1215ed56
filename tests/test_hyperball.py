"""operators/hyperball.py (T86) — neighborhood function / harmonic
centrality: pure-Python BFS reference twin, hand-computed harmonic
pins, truncation semantics, empty-ball zeros, duplicate/self-loop
tolerance, partitioning invariance, the generated DuckDB twin, the
HyperBall sketch tier's accuracy envelope vs the exact tier, and the
Python-free plan contract."""

from __future__ import annotations

import math
from collections import deque

import pytest

from warcsum_spark.operators.hyperball import (
    harmonic_exact,
    harmonic_hll,
    harmonic_sql,
    hyperball,
    neighborhood_exact,
)


def _py_ref(edges, max_t):
    """{node: (reached, harmonic)} by literal per-source BFS."""
    adj, nodes = {}, set()
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        nodes.update((a, b))
    out = {}
    for v in nodes:
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            if dist[u] == max_t:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        ds = [d for d in dist.values() if d >= 1]
        L = math.lcm(*range(1, max_t + 1))
        out[v] = (len(ds), sum(L // d for d in ds) / L)
    return out


def _run(spark, edges, max_t):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["reached"], r["harmonic"])
        for r in harmonic_exact(df, max_t).collect()
    }


# deterministic multi-out-degree graph: two edge families per i so the
# affine maps cannot collapse into a functional (out-degree-1) graph
_GRAPH = [((i * 7) % 30, (i * 13 + 3) % 30) for i in range(150)] + [
    ((i * 11 + 1) % 30, (i * 17 + 5) % 30) for i in range(150)
]


def test_matches_python_reference(spark):
    for max_t in (1, 2, 4, 7):
        assert _run(spark, _GRAPH, max_t) == _py_ref(_GRAPH, max_t)


def test_hand_computed_chain(spark):
    # 0→1→2→3: ball(0)={1,2,3} at d=1,2,3 → H = 1 + 1/2 + 1/3 = 11/6
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, max_t=4)
    assert got[0] == (3, pytest.approx(11 / 6))
    assert got[1] == (2, pytest.approx(3 / 2))
    assert got[2] == (1, 1.0)
    assert got[3] == (0, 0.0)  # empty out-ball still emitted as zeros


def test_truncation_at_max_t(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, max_t=2)
    assert got[0] == (2, pytest.approx(3 / 2))  # node 3 beyond horizon


def test_neighborhood_increments(spark):
    # diamond: 0→{1,2}→3 — node 3 is at distance 2 exactly once
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["node"], r["dist"]): r["cnt"]
        for r in neighborhood_exact(df, 3).collect()
    }
    assert got[(0, 1)] == 2 and got[(0, 2)] == 1
    assert (0, 3) not in got  # BFS fixpoint: no phantom rows past it


def test_duplicates_and_self_loops_tolerated(spark):
    edges = [(0, 1), (0, 1), (1, 1), (1, 2)]
    got = _run(spark, edges, max_t=3)
    assert got[0] == (2, pytest.approx(3 / 2))
    assert got[1] == (1, 1.0)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(_GRAPH, "src long, dst long")
    one = {
        r["node"]: (r["reached"], r["harmonic"])
        for r in harmonic_exact(df.coalesce(1), 5).collect()
    }
    many = {
        r["node"]: (r["reached"], r["harmonic"])
        for r in harmonic_exact(df.repartition(13), 5).collect()
    }
    assert one == many == _py_ref(_GRAPH, 5)


def test_duckdb_twin_matches_bit_for_bit(spark):
    duckdb = pytest.importorskip("duckdb")
    vals = ", ".join(f"({a}, {b})" for a, b in _GRAPH)
    sql = harmonic_sql(f"src(src, dst) AS (VALUES {vals})", max_t=5)
    got = {n: (r, h) for n, r, h in duckdb.sql(sql).fetchall()}
    assert got == _run(spark, _GRAPH, 5)


def test_hyperball_estimates_track_exact_balls(spark):
    # balls here are <= 30 nodes — deep inside the linear-counting
    # regime at p=10 (m=1024), where HLL is a near-exact counter
    df = spark.createDataFrame(_GRAPH, "src long, dst long")
    est = {
        (r["node"], r["t"]): r["est_ball"]
        for r in hyperball(df, 5, p=10).collect()
    }
    counts = {}
    for (n, _), c in (
        (
            (r["node"], r["dist"]),
            r["cnt"],
        )
        for r in neighborhood_exact(df, 5).collect()
    ):
        counts[n] = counts.get(n, 0) + c
    for n, total in counts.items():
        exact_ball = total + 1  # self
        ts = [t for (m, t) in est if m == n]
        got = est[(n, max(ts))]
        assert got == pytest.approx(exact_ball, rel=0.06)


def test_hll_harmonic_tracks_exact(spark):
    df = spark.createDataFrame(_GRAPH, "src long, dst long")
    exact = _run(spark, _GRAPH, 5)
    approx = {
        r["node"]: r["est_harmonic"]
        for r in harmonic_hll(df, 5, p=10).collect()
    }
    for n, (_, h) in exact.items():
        if h > 0:
            assert approx[n] == pytest.approx(h, rel=0.15)


def test_rejects_bad_max_t(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        harmonic_exact(df, 0)
    with pytest.raises(ValueError):
        hyperball(df, -1)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    for out in (harmonic_exact(df, 2), hyperball(df, 2)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

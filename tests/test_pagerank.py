"""T32 PageRank: numpy power-iteration reference, mass conservation,
dangling redistribution, duplicate-edge collapse, known-graph values."""

from __future__ import annotations

import numpy as np
import pytest

from warcsum_spark.operators.pagerank import pagerank


def _ref(edges, damping=0.85, iters=4, round_scale=10):
    """Independent dense power iteration with the SAME per-round
    rounding the engine pins for cross-engine exactness."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in e:
        out[idx[s]] += 1
    r = np.full(n, round(1.0 / n, round_scale))
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in e:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dm = r[out == 0].sum()
        r = np.round(
            (1.0 - damping) / n + damping * (contrib + dm / n), round_scale
        )
    return {nodes[i]: r[i] for i in range(n)}


def _collect(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_matches_reference_random_graph(spark):
    rng = np.random.RandomState(7)
    edges = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 40))) for _ in range(300)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _collect(pagerank(df, iters=4))
    ref = _ref(edges, iters=4)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k


def test_mass_conserved_and_dangling(spark):
    # 0 -> 1 -> 2, node 2 dangling: total rank mass stays 1
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _collect(pagerank(df, iters=8))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # the chain end accumulates the most rank
    assert got[2] > got[1] > got[0]


def test_duplicate_edges_collapse(spark):
    """Link multiplicity must not multiply rank flow (classic
    formulation: the edge SET, not the edge multiset)."""
    once = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    dup = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (0, 2)], "src long, dst long"
    )
    assert _collect(pagerank(once, iters=3)) == _collect(pagerank(dup, iters=3))


def test_two_node_cycle_symmetry(spark):
    got = _collect(
        pagerank(spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long"), iters=6)
    )
    assert got[0] == got[1] == pytest.approx(0.5, abs=1e-9)

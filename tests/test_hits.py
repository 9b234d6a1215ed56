"""T55 HITS hubs/authorities (operators/hits.py): pinned against an
independent numpy power-iteration reference with the same rounding, plus
structural cases (pure hub/authority separation, dup-edge collapse)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.hits import hits


def _ref_hits(edges, iters=4, round_scale=10):
    """Independent reference: dense adjacency, numpy half-steps with the
    operator's round-after-normalize discipline."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        a = np.round(a / max(np.linalg.norm(a), 1e-12), round_scale)
        h = A @ a
        h = np.round(h / max(np.linalg.norm(h), 1e-12), round_scale)
    return {n: (h[idx[n]], a[idx[n]]) for n in nodes}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pure_hub_and_authority_separation(spark):
    # 1,2,3 all point at 10 and 11; nothing points at 1,2,3.
    edges = [(s, d) for s in (1, 2, 3) for d in (10, 11)]
    out = {r.node: r for r in hits(_df(spark, edges), iters=3).collect()}
    for s in (1, 2, 3):
        assert out[s].authority == 0.0
        assert out[s].hub > 0.5
    for d in (10, 11):
        assert out[d].hub == 0.0
        assert out[d].authority > 0.5


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(3)
    edges = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 30))) for _ in range(120)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    got = {r.node: (r.hub, r.authority) for r in hits(_df(spark, edges)).collect()}
    want = _ref_hits(edges)
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == pytest.approx(want[n][0], abs=1e-9), n
        assert got[n][1] == pytest.approx(want[n][1], abs=1e-9), n


def test_duplicate_edges_collapse(spark):
    base = [(1, 2), (3, 2), (1, 4)]
    out1 = {r.node: (r.hub, r.authority) for r in hits(_df(spark, base)).collect()}
    out2 = {
        r.node: (r.hub, r.authority)
        for r in hits(_df(spark, base + base + base)).collect()
    }
    assert out1 == out2


def test_l2_norm_is_one(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    df = hits(_df(spark, edges), iters=2)
    norms = df.agg(
        F.sum(F.col("hub") * F.col("hub")).alias("h2"),
        F.sum(F.col("authority") * F.col("authority")).alias("a2"),
    ).collect()[0]
    assert norms.h2 == pytest.approx(1.0, abs=1e-6)
    assert norms.a2 == pytest.approx(1.0, abs=1e-6)

"""T52 redirect-chain resolution: pointer-doubling output vs an
independent step-walker reference over random functional graphs, hop
budget boundaries, cycles, malformed inputs, and the all-JVM plan."""

from __future__ import annotations

import random

import pytest

from warcsum_spark.operators.redirects import resolve_redirects


def _reference(edges, max_hops):
    """Step-by-step walker with a hop budget — what an HTTP client does."""
    nxt = {}
    for s, d in edges:
        if s not in nxt or d < nxt[s]:
            nxt[s] = d
    out = {}
    for s in nxt:
        cur, hops = nxt[s], 1
        while cur in nxt and hops <= max_hops:
            cur, hops = nxt[cur], hops + 1
        if cur not in nxt and hops <= max_hops:
            out[s] = (cur, hops, True)
        else:
            out[s] = (None, None, False)
    return out


def _run(spark, edges, max_hops):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    return {r.src: (r.final_url, r.hops, r.resolved) for r in rows}


def test_chains_cycles_budget(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]          # 3-hop chain
    edges += [("x", "y"), ("y", "x"), ("s", "s")]          # 2-cycle, self-loop
    edges += [(f"n{i}", f"n{i+1}") for i in range(9)]      # 9-hop chain
    for budget in (1, 2, 5, 9, 20):
        assert _run(spark, edges, budget) == _reference(edges, budget)


def test_random_functional_graphs(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = [f"u{i}" for i in range(120)]
        # each node redirects to a random node (or is terminal) —
        # random functional graph: rho-shaped paths into cycles
        edges = [
            (n, rng.choice(nodes)) for n in nodes if rng.random() < 0.8
        ]
        for budget in (3, 10, 50):
            assert _run(spark, edges, budget) == _reference(edges, budget)


def test_malformed_multi_edge_deterministic(spark):
    edges = [("m", "zz"), ("m", "aa"), ("aa", "end")]
    assert _run(spark, edges, 5)["m"] == ("end", 2, True)


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)


def test_plan_all_jvm(spark):
    df = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(20)], "src string, dst string"
    )
    plan = (
        resolve_redirects(df, max_hops=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan

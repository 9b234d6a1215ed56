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


def test_pagerank_drives_frontier_priorities(spark):
    """Composition: PageRank scores become frontier seed priorities and
    the crawl order matches the oracle simulator fed the same scores —
    the north-star 'priority queue' with a computed, not asserted,
    priority."""
    from warcsum_spark.fixtures import gen_frontier_fixture
    from warcsum_spark.frontier.superstep import (
        frontier_round,
        init_frontier,
        scheduled_order,
    )
    from warcsum_spark.oracle import canonicalize_url as oracle_canon
    from warcsum_spark.oracle import simulate_crawl
    from pyspark.sql import functions as F

    seeds, link_graph, budgets, robots = gen_frontier_fixture()
    # PR over the fixture link graph (canonical urls as nodes)
    edge_rows = [
        (oracle_canon(u), oracle_canon(v))
        for u, outs in link_graph.items()
        for v in outs
        if oracle_canon(u) and oracle_canon(v)
    ]
    edges = spark.createDataFrame(edge_rows, "src string, dst string")
    pr = pagerank(edges, iters=3)
    scores = {r["node"]: r["rank"] for r in pr.collect()}

    pr_seeds = [(u, scores[oracle_canon(u)]) for u, _ in seeds]
    sim = simulate_crawl(pr_seeds, link_graph, budgets, robots, rounds=3)
    state = init_frontier(
        spark,
        pr.select(F.col("node").alias("url"), F.col("rank").alias("priority"))
        .join(
            spark.createDataFrame(
                [(oracle_canon(u),) for u, _ in seeds], "url string"
            ),
            "url",
        ),
    )
    lg_df = spark.createDataFrame(
        [(u, outs) for u, outs in sorted(link_graph.items())],
        "url string, outlinks array<string>",
    )
    pol_df = spark.createDataFrame(sorted(budgets.items()), "host string, budget int")
    robots_df = spark.createDataFrame(
        [
            (h, [{"allow": a, "prefix": p} for a, p in rules])
            for h, rules in sorted(robots.items())
        ],
        "host string, rules array<struct<allow boolean, prefix string>>",
    )
    for rnd in range(3):
        state, sched = frontier_round(
            spark, state, lg_df, robots=robots_df, politeness=pol_df
        )
        assert scheduled_order(sched) == sim.scheduled_per_round[rnd], f"round {rnd}"

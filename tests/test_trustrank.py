"""T79 TrustRank: numpy personalized-power-iteration reference, mass
conservation into the seed set, spam-isolation property, seed
normalization over graph members only."""

from __future__ import annotations

import numpy as np
import pytest

from warcsum_spark.operators.pagerank import trustrank


def _ref(edges, seeds, damping=0.85, iters=4, round_scale=10):
    """Independent dense iteration with the engine's per-round
    rounding; teleport and dangling mass concentrate on the seeds."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    s_in = sorted(set(seeds) & set(nodes))
    t = np.zeros(n)
    for s in s_in:
        t[idx[s]] = 1.0 / len(s_in)
    out = np.zeros(n)
    for s, _ in e:
        out[idx[s]] += 1
    r = np.round(t, round_scale)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in e:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dm = r[out == 0].sum()
        r = np.round(
            (1.0 - damping) * t + damping * (contrib + dm * t), round_scale
        )
    return {nodes[i]: r[i] for i in range(n)}


def _run(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(s,) for s in seeds], "node long")
    return {r["node"]: r["rank"] for r in trustrank(df, sd, **kw).collect()}


def test_matches_reference_random_graph(spark):
    rng = np.random.RandomState(11)
    edges = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 40))) for _ in range(300)
    ]
    seeds = [0, 1, 2, 3, 4]
    got = _run(spark, edges, seeds, iters=4)
    ref = _ref(edges, seeds, iters=4)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k


def test_mass_conserved_in_seed_component(spark):
    # 0 -> 1 -> 2 (2 dangling, mass returns to seed 0): total stays 1
    got = _run(spark, [(0, 1), (1, 2)], [0], iters=8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


def test_spam_island_gets_zero_trust(spark):
    """The point of TrustRank: a link island unreachable from the
    seeds — a link farm citing itself — ends with rank exactly 0,
    however densely it interlinks (PageRank would rank it happily)."""
    trusted = [(0, 1), (1, 2), (2, 0)]
    farm = [(10, 11), (11, 12), (12, 10), (10, 12), (12, 11), (11, 10)]
    got = _run(spark, trusted + farm, [0], iters=6)
    assert got[10] == got[11] == got[12] == 0.0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


def test_seeds_outside_graph_are_ignored(spark):
    # seed 99 is not a node: normalization uses the one in-graph seed,
    # so ranks match the single-seed run exactly
    edges = [(0, 1), (1, 2)]
    a = _run(spark, edges, [0], iters=4)
    b = _run(spark, edges, [0, 99], iters=4)
    assert a == b
    assert 99 not in b


def test_uniform_seed_set_recovers_pagerank(spark):
    """Seeding EVERY node makes the teleport uniform — TrustRank
    degenerates to PageRank (same trajectory, same rounding)."""
    from warcsum_spark.operators.pagerank import pagerank

    rng = np.random.RandomState(3)
    edges = [
        (int(rng.randint(0, 15)), int(rng.randint(0, 20))) for _ in range(80)
    ]
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    tr = _run(spark, edges, nodes, iters=3)
    for k in pr:
        assert tr[k] == pytest.approx(pr[k], abs=1e-9), k


def test_trustrank_drives_frontier_priorities(spark):
    """Composition (the operator's purpose): TrustRank from the crawl's
    own seed list becomes the frontier priority — spam-demoted crawl
    ordering — and the order matches the oracle simulator fed the same
    scores, round by round."""
    from pyspark.sql import functions as F

    from warcsum_spark.fixtures import gen_frontier_fixture
    from warcsum_spark.frontier.superstep import (
        frontier_round,
        init_frontier,
        scheduled_order,
    )
    from warcsum_spark.oracle import canonicalize_url as oracle_canon
    from warcsum_spark.oracle import simulate_crawl

    seeds, link_graph, budgets, robots = gen_frontier_fixture()
    edge_rows = [
        (oracle_canon(u), oracle_canon(v))
        for u, outs in link_graph.items()
        for v in outs
        if oracle_canon(u) and oracle_canon(v)
    ]
    edges = spark.createDataFrame(edge_rows, "src string, dst string")
    trusted = spark.createDataFrame(
        [(oracle_canon(u),) for u, _ in seeds], "node string"
    )
    tr = trustrank(edges, trusted, iters=3)
    scores = {r["node"]: r["rank"] for r in tr.collect()}

    tr_seeds = [(u, scores[oracle_canon(u)]) for u, _ in seeds]
    sim = simulate_crawl(tr_seeds, link_graph, budgets, robots, rounds=3)
    state = init_frontier(
        spark,
        tr.select(F.col("node").alias("url"), F.col("rank").alias("priority"))
        .join(trusted.withColumnRenamed("node", "url"), "url"),
    )
    lg_df = spark.createDataFrame(
        [(u, outs) for u, outs in sorted(link_graph.items())],
        "url string, outlinks array<string>",
    )
    pol_df = spark.createDataFrame(
        sorted(budgets.items()), "host string, budget int"
    )
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
        assert (
            scheduled_order(sched) == sim.scheduled_per_round[rnd]
        ), f"round {rnd}"

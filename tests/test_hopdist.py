"""operators/hopdist.py vs an independent Python BFS, plus seed/root
semantics, hop-budget truncation, cycle handling and early exit."""

from __future__ import annotations

from collections import deque

from warcsum_spark.operators.hopdist import hop_distance


def _ref_bfs(edges, seeds, max_hops):
    """Dict node -> (dist, root): textbook multi-source BFS; root is the
    min seed id over shortest paths, computed by min-collapsing per
    level exactly as the operator's contract states."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    best = {s: (0, s) for s in set(seeds)}
    frontier = dict((s, s) for s in set(seeds))
    for hop in range(1, max_hops + 1):
        nxt = {}
        for node, root in frontier.items():
            for d in adj.get(node, ()):
                if d in best:
                    continue
                if d not in nxt or root < nxt[d]:
                    nxt[d] = root
        for d, root in nxt.items():
            best[d] = (hop, root)
        if not nxt:
            break
        frontier = nxt
    return best


def _run(spark, edges, seeds, max_hops):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r["node"]: (r["dist"], r["root"])
        for r in hop_distance(e, s, max_hops=max_hops).collect()
    }


def test_chain_with_cycle(spark):
    # 0→1→2→3→4→0 cycle plus a spur 2→10→11
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 10), (10, 11)]
    got = _run(spark, edges, [0], max_hops=10)
    assert got == _ref_bfs(edges, [0], 10)
    assert got[0] == (0, 0) and got[4] == (4, 0) and got[11] == (4, 0)


def test_hop_budget_truncates(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _run(spark, edges, [0], max_hops=3)
    assert set(got) == {0, 1, 2, 3}
    assert got[3] == (3, 0)


def test_multi_seed_min_root(spark):
    # node 5 reachable in 2 hops from both seeds 9 and 1 → root = 1;
    # seed 9 also reaches 6 first (1 hop) → root stays 9 there
    edges = [(9, 6), (6, 5), (1, 7), (7, 5)]
    got = _run(spark, edges, [9, 1], max_hops=5)
    ref = _ref_bfs([(9, 6), (6, 5), (1, 7), (7, 5)], [9, 1], 5)
    assert got == ref
    assert got[5] == (2, 1) and got[6] == (1, 9)


def test_seed_reachable_from_seed_keeps_dist0(spark):
    edges = [(0, 1), (1, 2)]
    got = _run(spark, edges, [0, 1], max_hops=4)
    assert got[1] == (0, 1)  # never relabeled to (1, 0) by the 0→1 edge
    assert got[2] == (1, 1)  # discovered from seed 1's tree at hop 1
    assert got == _ref_bfs(edges, [0, 1], 4)


def test_duplicate_edges_and_seeds(spark):
    edges = [(0, 1), (0, 1), (1, 2)]
    got = _run(spark, edges, [0, 0], max_hops=3)
    assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0)}


def test_random_graph_matches_reference(spark):
    edges = [((i * 7) % 53, (i * 11 + 3) % 53) for i in range(120)]
    seeds = [0, 5]
    got = _run(spark, edges, seeds, max_hops=6)
    assert got == _ref_bfs(edges, seeds, 6)

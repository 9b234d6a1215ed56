"""operators/katz.py (T113) — Katz centrality: a pure-Python twin
(same per-round rounding), hand pins on a path and a star, the
no-vote-splitting contrast vs PageRank (Katz counts walks, PageRank
divides by out-degree), the dangling-node β base, truncation algebra
(iters-round score == the closed Neumann partial sum on a path),
duplicate-edge collapse, bit-equal partitioning invariance, and DuckDB
unrolled-CTE parity."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from warcsum_spark.operators.katz import katz_centrality, katz_oracle_sql

ALPHA, BETA, ITERS, SCALE = 0.1, 1.0, 4, 10


def _py_ref(edges, alpha=ALPHA, beta=BETA, iters=ITERS, scale=SCALE):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    in_adj = defaultdict(list)
    for s, d in e:
        in_adj[d].append(s)
    x = {n: round(beta, scale) for n in nodes}
    for _ in range(iters):
        x = {
            n: round(beta + alpha * sum(x[s] for s in in_adj[n]), scale)
            for n in nodes
        }
    return x


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["katz"] for r in katz_centrality(df, **kw).collect()
    }


def _check(spark, edges, **kw):
    got = _run(spark, edges, **kw)
    ref = _py_ref(edges, **{k: v for k, v in kw.items() if k != "src_col"})
    assert got == ref
    return got


def test_path_hand_pin(spark):
    # 0 -> 1 -> 2, alpha=.5: x(0)=1 (no in-edges); x(1)=1+.5*1=1.5 every
    # round; x(2) converges to 1 + .5*1.5 = 1.75 by round 2
    got = _check(spark, [(0, 1), (1, 2)], alpha=0.5, iters=4)
    assert got[0] == 1.0
    assert got[1] == 1.5
    assert got[2] == 1.75


def test_truncation_partial_sum_on_path(spark):
    # long path, iters=2: x(tail) = beta*(1 + a + a^2) exactly — walks
    # longer than the truncation contribute nothing yet
    path = [(i, i + 1) for i in range(6)]
    got = _run(spark, path, alpha=0.25, iters=2)
    assert got[6] == pytest.approx(1 + 0.25 + 0.0625, abs=1e-10)
    got4 = _run(spark, path, alpha=0.25, iters=4)
    assert got4[6] == pytest.approx(sum(0.25**k for k in range(5)), abs=1e-9)


def test_star_fan_in(spark):
    # 10 hubs -> one target: target = beta + 10*alpha*beta
    edges = [(i, 100) for i in range(10)]
    got = _check(spark, edges)
    assert got[100] == pytest.approx(1 + 10 * ALPHA, abs=1e-10)
    assert all(got[i] == 1.0 for i in range(10))


def test_no_vote_splitting_vs_pagerank(spark):
    # hub 0 -> {10..19} (out-degree 10), hub 1 -> {20} (out-degree 1).
    # Katz gives node 10 and node 20 the SAME score (walk counts don't
    # divide); PageRank gives node 20 ten times node 10's inflow.
    edges = [(0, 10 + i) for i in range(10)] + [(1, 20)]
    got = _check(spark, edges)
    assert got[10] == got[20]

    from warcsum_spark.operators.pagerank import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    pr = {r["node"]: r["rank"] for r in pagerank(df, iters=2).collect()}
    assert pr[20] > pr[10] * 1.5


def test_dangling_nodes_hold_beta(spark):
    # dst-only nodes still get scored; src-only leaves stay at beta
    got = _check(spark, [(0, 1), (2, 1)])
    assert got[0] == BETA and got[2] == BETA
    assert got[1] == pytest.approx(BETA + 2 * ALPHA, abs=1e-10)


def test_cycle_accumulates(spark):
    # 2-cycle: both nodes identical; score grows with each round
    g2 = _run(spark, [(0, 1), (1, 0)], iters=2)
    g4 = _run(spark, [(0, 1), (1, 0)], iters=4)
    assert g2[0] == g2[1] and g4[0] == g4[1]
    assert g4[0] > g2[0]
    _check(spark, [(0, 1), (1, 0)])


def test_duplicate_edges_collapse(spark):
    a = _run(spark, [(0, 1), (0, 2)])
    b = _run(spark, [(0, 1), (0, 1), (0, 2), (0, 2), (0, 2)])
    assert a == b


def test_partitioning_invariance_bit_equal(spark):
    edges = [((i * 5) % 17, 100 + (i * i) % 13) for i in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(katz_centrality(df.repartition(1)).collect())
    b = sorted(katz_centrality(df.repartition(13)).collect())
    assert a == b


def test_python_twin_on_tangled_graph(spark):
    edges = (
        [((i * 5) % 11, (i * 7) % 13) for i in range(60)]
        + [(100, 101), (101, 102), (102, 100), (5, 100)]
    )
    _check(spark, edges)


def test_duckdb_twin_bit_parity(spark):
    edges = sorted(
        set(
            [((i * 5) % 11, 50 + (i * 7) % 9) for i in range(40)]
            + [(100, 200), (101, 200), (101, 201), (200, 100)]
        )
    )
    got = _run(spark, edges)
    got8 = {n: round(v, 8) for n, v in got.items()}
    con = duckdb.connect()
    con.execute("CREATE TABLE G (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO G VALUES (?, ?)", edges)
    cur = con.execute(katz_oracle_sql("SELECT src, dst FROM G"))
    rows = dict(cur.fetchall())
    assert rows == got8

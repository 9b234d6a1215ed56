"""operators/pagerank.py::spam_mass (T121) — Gyöngyi link-spam mass:
the link-farm scenario (farm-pumped target flagged, organic pages
not), the all-seeds ≡ zero-mass identity, the composition identity
against pagerank()/trustrank() outputs, and DuckDB twin parity."""

from __future__ import annotations

import duckdb

from warcsum_spark.operators.pagerank import (
    pagerank,
    spam_mass,
    spam_mass_oracle_sql,
    trustrank,
)


def _farm_graph():
    """0-1-2-3 an organic chain from the trusted seed 0; nodes
    10..19 a link farm all pointing at target 9; the farm has no
    inlink from the organic side, so trust never reaches node 9."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges += [(10 + i, 9) for i in range(10)]
    edges += [(9, 10 + i) for i in range(10)]  # the classic farm loop
    return edges


def _run(spark, edges, seeds, rel_thresh=0.5):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    res = spam_mass(e, s, damping=0.85, iters=4, rel_thresh=rel_thresh)
    return {r["node"]: tuple(r)[1:] for r in res.collect()}


def test_link_farm_flagged_organic_not(spark):
    got = _run(spark, _farm_graph(), seeds=[0])
    # the farm target accumulates real PageRank…
    organic_pr = got[1][0]
    assert got[9][0] > organic_pr
    # …but nearly all of it is spam mass: flagged
    assert got[9][4] is True and got[9][3] > 0.9
    # organic chain pages are mostly trust-covered: not flagged
    for n in (0, 1, 2, 3):
        assert got[n][4] is False, n


def test_all_seeds_zero_mass(spark):
    edges = _farm_graph()
    nodes = sorted({x for e in edges for x in e})
    got = _run(spark, edges, seeds=nodes)
    # teleport uniform over ALL nodes ⇒ trustrank ≡ pagerank,
    # identical rounded trajectories ⇒ exactly zero mass everywhere
    for v in got.values():
        assert v[2] == 0.0 and v[3] == 0.0 and v[4] is False


def test_composition_identity(spark):
    edges = _farm_graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    pr = {
        r["node"]: round(r["rank"], 8)
        for r in pagerank(e, damping=0.85, iters=4).collect()
    }
    tr = {
        r["node"]: round(r["rank"], 8)
        for r in trustrank(e, s, damping=0.85, iters=4).collect()
    }
    got = _run(spark, edges, seeds=[0])
    for n, (p, t, m, rel, flag) in got.items():
        assert p == pr[n] and t == tr[n]
        assert m == round(p - t, 8)
        assert rel == round((p - t) / p, 6)
        assert flag == (rel >= 0.5)


def test_duckdb_twin_parity(spark):
    edges = _farm_graph()
    edges_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in edges
    ) + ") AS t(src, dst)"
    sql = spam_mass_oracle_sql(
        edges_cte, "SELECT 0 AS node", damping=0.85, iters=4, rel_thresh=0.5
    )
    ora = {r[0]: tuple(r)[1:] for r in duckdb.sql(sql).fetchall()}
    assert _run(spark, edges, seeds=[0]) == ora

"""operators/kcore.py (T85) — k-core peeling: pure-Python reference
twin, multi-round cascade, structure pins (triangle+tail, clique),
empty core, partitioning invariance, the generated DuckDB twin, and
the Python-free plan contract."""

from __future__ import annotations

import pytest

from warcsum_spark.operators.kcore import k_core, k_core_sql


def _py_ref(edges, k):
    """{node: core_degree} by literal peeling."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        victims = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(victims)
        for v in victims:
            for nb in adj.pop(v):
                adj[nb].discard(v)
    return {n: len(nb) for n, nb in adj.items()}


def _run(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["degree"] for r in k_core(df, k, **kw).collect()
    }


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_triangle_survives_tail_peels(spark):
    edges = _clique([1, 2, 3]) + [(3, 4), (4, 5)]
    assert _run(spark, edges, k=2) == {1: 2, 2: 2, 3: 2}


def test_multi_round_cascade(spark):
    # a genuine three-round starvation chain into a K4: the degree-1
    # leaves peel round 1 (node 1 drops to 2, node 2 holds at exactly
    # 3), node 1 peels round 2 (nodes 2 and 3 drop to 2), nodes 2 and 3
    # peel round 3 — only then is the clique alone the 3-core
    c = _clique([10, 11, 12, 13])
    edges = c + [
        (1, 100), (1, 101), (1, 102),   # leaves of 1
        (2, 103), (2, 104),             # leaves of 2
        (2, 1), (2, 10),
        (3, 1), (3, 2), (3, 11),
    ]
    got = _run(spark, edges, k=3)
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


def test_matches_python_reference(spark):
    # deterministic pseudo-random graph, several k values
    edges = [((i * 7) % 40, (i * 13 + 3) % 40) for i in range(300)]
    for k in (2, 3, 4, 5):
        assert _run(spark, edges, k=k) == _py_ref(edges, k)


def test_empty_core_and_self_loops(spark):
    edges = [(1, 2), (2, 3), (3, 1), (7, 7)]
    assert _run(spark, edges, k=3) == {}
    assert _run(spark, edges, k=2) == {1: 2, 2: 2, 3: 2}


def test_partitioning_invariance(spark):
    edges = [((i * 11) % 30, (i * 17 + 5) % 30) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    one = {r["node"]: r["degree"] for r in k_core(df.coalesce(1), 3).collect()}
    many = {
        r["node"]: r["degree"]
        for r in k_core(df.repartition(13), 3).collect()
    }
    assert one == many == _py_ref(edges, 3)


def test_duckdb_twin_matches(spark):
    duckdb = pytest.importorskip("duckdb")
    edges = [((i * 7) % 40, (i * 13 + 3) % 40) for i in range(300)]
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = k_core_sql(
        f"src(src, dst) AS (VALUES {vals})", k=3, rounds=12
    )
    got = {n: d for n, d in duckdb.sql(sql).fetchall()}
    assert got == _run(spark, edges, k=3) == _py_ref(edges, 3)


def test_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(df, 0)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = k_core(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

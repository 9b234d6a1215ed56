"""operators/modularity.py (T107) — Newman modularity: a pure-Python
twin, the two-triangle hand pin (Q = 0.5), the trivial-partition zeros
(one community ≡ 0; singletons ≡ −Σd²/4m²), edgeless pinning,
duplicate/direction/self-loop normalization invariance, bit-equal
partitioning invariance, composition with T61's LPA output, DuckDB
twin parity, and the Python-free plan contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.lpa import label_propagation, lpa_oracle_sql
from warcsum_spark.operators.modularity import modularity, modularity_sql


def _py_ref(edges, labels):
    canon = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    m = len(canon)
    deg: dict[int, int] = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    d_c: dict[int, int] = {}
    for node, lbl in labels.items():
        d_c[lbl] = d_c.get(lbl, 0) + deg.get(node, 0)
    l_c: dict[int, int] = {}
    for a, b in canon:
        if labels[a] == labels[b]:
            l_c[labels[a]] = l_c.get(labels[a], 0) + 1
    s_l = sum(l_c.values())
    s_dd = sum(d * d for d in d_c.values())
    q = 0.0 if m == 0 else round((4 * m * s_l - s_dd) / (4 * m * m), 6)
    return {
        "n_nodes": len(labels),
        "n_edges": m,
        "n_communities": len(d_c),
        "intra_edges": s_l,
        "modularity": q,
    }


def _run(spark, edges, labels):
    e = spark.createDataFrame(edges, "src long, dst long")
    l = spark.createDataFrame(list(labels.items()), "node long, label long")
    return modularity(e, l).collect()[0].asDict()


def _check(spark, edges, labels):
    got = _run(spark, edges, labels)
    ref = _py_ref(edges, labels)
    for k, v in ref.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=1e-9), k
        else:
            assert got[k] == v, k
    return got


def test_two_triangles_hand_pin(spark):
    # two disjoint triangles, perfectly labeled: the classic Q = 1/2
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    got = _check(spark, edges, labels)
    assert got["modularity"] == pytest.approx(0.5, abs=1e-9)
    assert got["intra_edges"] == 6 and got["n_communities"] == 2


def test_single_community_is_zero(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    labels = {0: 7, 1: 7, 2: 7, 3: 7}
    got = _check(spark, edges, labels)
    assert got["modularity"] == 0.0


def test_singleton_communities_closed_form(spark):
    # every node its own community: L = 0, Q = -sum(d^2)/(4 m^2)
    edges = [(0, 1), (1, 2), (2, 3)]
    labels = {i: i for i in range(4)}
    got = _check(spark, edges, labels)
    assert got["modularity"] == pytest.approx(
        -(1 + 4 + 4 + 1) / (4 * 9), abs=1e-6
    )


def test_normalization_invariance(spark):
    # duplicates, reversed duplicates and self-loops collapse away
    base = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    noisy = base + [(1, 0), (2, 1), (0, 0), (4, 3), (3, 4), (5, 5)]
    labels = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    assert _run(spark, base, labels) == _run(spark, noisy, labels)


def test_isolated_labeled_node_does_not_change_q(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    with_iso = dict(labels)
    with_iso[99] = 99
    a = _run(spark, edges, labels)
    b = _check(spark, edges, with_iso)
    assert b["modularity"] == a["modularity"]
    assert b["n_communities"] == a["n_communities"] + 1
    assert b["n_nodes"] == a["n_nodes"] + 1


def test_edgeless_graph_pins_zero(spark):
    got = _run(spark, [(1, 1)], {1: 1})  # self-loop only -> no edges
    assert got == {
        "n_nodes": 1,
        "n_edges": 0,
        "n_communities": 1,
        "intra_edges": 0,
        "modularity": 0.0,
    }


def test_good_split_beats_random_split(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    good = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    bad = {0: 0, 1: 3, 2: 0, 3: 3, 4: 0, 5: 3}
    assert (
        _run(spark, edges, good)["modularity"]
        > _run(spark, edges, bad)["modularity"]
    )


def test_partitioning_invariance_bit_equal(spark):
    edges = [
        (i % 23, (i * i) % 23) for i in range(300)
    ]
    labels = {i: i % 4 for i in range(23)}
    e = spark.createDataFrame(edges, "src long, dst long")
    l = spark.createDataFrame(list(labels.items()), "node long, label long")
    a = modularity(e.repartition(1), l.repartition(1)).collect()
    b = modularity(e.repartition(13), l.repartition(7)).collect()
    assert a == b


def test_lpa_composition_matches_python_twin(spark):
    # modularity OF label_propagation's labels — the driver-query chain.
    # Cliques, not rings: synchronous LPA fragments/oscillates on sparse
    # rings (a documented pathology), while dense groups converge.
    edges = [
        (g * 10 + i, g * 10 + j)
        for g in range(3)
        for i in range(5)
        for j in range(i + 1, 5)
    ] + [(0, 10), (10, 20)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labels_df = label_propagation(e, iters=4)
    labels = {r["node"]: r["label"] for r in labels_df.collect()}
    got = modularity(e, labels_df).collect()[0].asDict()
    ref = _py_ref(edges, labels)
    assert got == pytest.approx(ref)
    assert got["modularity"] > 0.5  # three planted cliques: real structure


def test_duckdb_twin_bit_parity(spark):
    edges = [
        ((i * 7) % 19, (i * i + 3) % 19) for i in range(120)
    ]
    labels = {i: (i * 5) % 3 for i in range(19)}
    got = _run(spark, edges, labels)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE E (src BIGINT, dst BIGINT)"
    )
    con.executemany("INSERT INTO E VALUES (?, ?)", edges)
    con.execute("CREATE TABLE L (node BIGINT, label BIGINT)")
    con.executemany("INSERT INTO L VALUES (?, ?)", list(labels.items()))
    sql = modularity_sql("SELECT src, dst FROM E", "SELECT node, label FROM L")
    cols = [d[0] for d in con.execute(sql).description]
    row = dict(zip(cols, con.execute(sql).fetchone()))
    assert row == got


def test_duckdb_twin_composes_with_lpa_oracle(spark):
    edges = [
        (g * 10 + i, g * 10 + j)
        for g in range(3)
        for i in range(5)
        for j in range(i + 1, 5)
    ] + [(0, 10), (10, 20)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = modularity(e, label_propagation(e, iters=4)).collect()[0].asDict()
    con = duckdb.connect()
    con.execute("CREATE TABLE E (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO E VALUES (?, ?)", edges)
    lpa_sub = lpa_oracle_sql("SELECT src, dst FROM E", iters=4)
    sql = modularity_sql("SELECT src, dst FROM E", lpa_sub)
    cols = [d[0] for d in con.execute(sql).description]
    row = dict(zip(cols, con.execute(sql).fetchone()))
    assert row == got


def test_plan_is_python_free(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    l = spark.createDataFrame([(0, 0), (1, 0), (2, 0)], "node long, label long")
    plan = modularity(e, l)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan

"""operators/assortativity.py (T95) — directed degree assortativity:
a numpy Pearson reference twin on all four profiles, sign pins on
canonical graphs (star = disassortative, regular ring = NULL), the
multi-edge/self-loop contract, partitioning invariance, DuckDB twin
bit parity, and the Python-free plan contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.assortativity import (
    PROFILES,
    assortativity_sql,
    degree_assortativity,
)


def _py_ref(edges):
    from collections import Counter

    outd = Counter(u for u, _ in edges)
    ind = Counter(v for _, v in edges)

    def pearson(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx == 0 or vy == 0:
            return None
        return round((n * sxy - sx * sy) / (vx * vy) ** 0.5, 6)

    sides = {
        "src_out": [outd[u] for u, _ in edges],
        "src_in": [ind[u] for u, _ in edges],
        "dst_out": [outd[v] for _, v in edges],
        "dst_in": [ind[v] for _, v in edges],
    }
    out = {
        "n_edges": len(edges),
        "n_nodes": len({u for u, _ in edges} | {v for _, v in edges}),
    }
    for name, a, b in PROFILES:
        out[f"r_{name}"] = pearson(sides[a], sides[b])
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return degree_assortativity(df).collect()[0].asDict()


def test_python_reference_twin(spark):
    edges = [
        (0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (2, 4),
        (5, 0), (5, 1), (5, 2), (1, 5),
    ]
    got = _run(spark, edges)
    ref = _py_ref(edges)
    for k, v in ref.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=1e-6), k
        else:
            assert got[k] == v, k


def test_star_is_disassortative(spark):
    # hub → 20 leaves: high-out-degree sources always meet
    # low-in-degree... in-degree constant (1) → out_in NULL; but
    # leaves' out-degree 0 vs hub out 20 → out_out over edges is
    # degenerate too (src always hub). The informative profile is
    # in_out on the AUGMENTED star with returns: leaf → hub.
    edges = [(0, i) for i in range(1, 21)] + [(i, 0) for i in range(1, 21)]
    got = _run(spark, edges)
    ref = _py_ref(edges)
    assert got["r_out_out"] == ref["r_out_out"]
    assert got["r_out_out"] is not None and got["r_out_out"] < 0
    assert got["r_in_in"] < 0


def test_regular_ring_has_no_variance(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)]
    got = _run(spark, edges)
    for name, _, _ in PROFILES:
        assert got[f"r_{name}"] is None, name


def test_multi_edges_count_multiply(spark):
    base = [(0, 1), (1, 2), (2, 0), (0, 2)]
    doubled = base + base
    a = _run(spark, base)
    b = _run(spark, doubled)
    assert b["n_edges"] == 2 * a["n_edges"]
    ref = _py_ref(doubled)
    for name, _, _ in PROFILES:
        assert b[f"r_{name}"] == ref[f"r_{name}"], name


def test_partitioning_invariance_bit_equal(spark):
    edges = [(i % 23, (i * 7) % 23) for i in range(500)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = degree_assortativity(df.repartition(1)).collect()[0].asDict()
    b = degree_assortativity(df.repartition(13)).collect()[0].asDict()
    assert a == b  # exact sums → bit equality, not approx


def test_duckdb_twin_bit_parity(spark):
    edges = [(i % 9, (i * 5 + 1) % 9) for i in range(200)] + [(50, 0)]
    got = _run(spark, edges)
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    sql = assortativity_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)"
    )
    cur = duckdb.connect().execute(sql)
    want = dict(zip([d[0] for d in cur.description], cur.fetchall()[0]))
    assert got == want


def test_plan_python_free_no_cartesian(spark):
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    plan = (
        degree_assortativity(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    assert "CartesianProduct" not in plan

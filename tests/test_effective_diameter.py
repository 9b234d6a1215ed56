"""operators/hyperball.py (T105) — distance distribution + interpolated
effective diameter: a pure-Python BFS twin, hand-computed pins on a
directed path (including the truncated-horizon contract and a custom
quantile), the edgeless empty pin, DuckDB twin bit parity, and the
Python-free final plan."""

from __future__ import annotations

from collections import deque

import duckdb
import pytest

from warcsum_spark.operators.hyperball import (
    distance_distribution,
    effective_diameter,
    effective_diameter_sql,
)


def _py_dd(edges, max_t):
    """{dist: pairs} over ordered reachable pairs, BFS per source."""
    adj, nodes = {}, set()
    for s, d in set(edges):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        nodes |= {s, d}
    out = {}
    for u in nodes:
        seen, q = {u}, deque([(u, 0)])
        while q:
            x, dx = q.popleft()
            if dx == max_t:
                continue
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    out[dx + 1] = out.get(dx + 1, 0) + 1
                    q.append((y, dx + 1))
    return out


def _py_eff(edges, max_t, q_num=9, q_den=10):
    dd = _py_dd(edges, max_t)
    if not dd:
        return None
    total = sum(dd.values())
    cum = 0
    for t in sorted(dd):
        prev = cum
        cum += dd[t]
        if cum * q_den >= total * q_num:
            return {
                "total_pairs": total,
                "eff_at": t,
                "effective_diameter": round(
                    (t - 1)
                    + (total * q_num - prev * q_den) / (q_den * dd[t]),
                    6,
                ),
            }
    return None


PATH = [(0, 1), (1, 2), (2, 3)]


def _run_eff(spark, edges, max_t, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = effective_diameter(df, max_t, **kw).collect()
    return rows[0].asDict() if rows else None


def test_distribution_hand_pin_path(spark):
    df = spark.createDataFrame(PATH, "src long, dst long")
    got = {
        r["dist"]: (r["pairs"], r["cum_pairs"])
        for r in distance_distribution(df, 5).collect()
    }
    assert got == {1: (3, 3), 2: (2, 5), 3: (1, 6)}


def test_effective_diameter_hand_pin_path(spark):
    # total 6; q=0.9 -> threshold at d3 (cum 6), prev 5:
    # eff = 2 + (54 - 50) / 10 = 2.4
    got = _run_eff(spark, PATH, 5)
    assert got == {
        "total_pairs": 6,
        "eff_at": 3,
        "effective_diameter": 2.4,
    }


def test_custom_quantile_median(spark):
    # q=1/2: d1 cum 3, 3*2 >= 6 -> t*=1, eff = (6-0)/(2*3) = 1.0
    got = _run_eff(spark, PATH, 5, q_num=1, q_den=2)
    assert got["eff_at"] == 1 and got["effective_diameter"] == 1.0


def test_truncated_horizon_contract(spark):
    # max_t=2: total 5; d2 cum 5, 50 >= 45 -> eff = 1 + (45-30)/20 = 1.75
    got = _run_eff(spark, PATH, 2)
    assert got == {
        "total_pairs": 5,
        "eff_at": 2,
        "effective_diameter": 1.75,
    }


def test_python_reference_twin(spark):
    edges = [(i % 11, (i * i + 1) % 11) for i in range(40)] + [
        (i % 11, (i + 1) % 11) for i in range(11)
    ]
    for max_t in (2, 4, 8):
        got = _run_eff(spark, edges, max_t)
        assert got == _py_eff(edges, max_t), max_t


def test_edgeless_graph_is_empty(spark):
    df = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert effective_diameter(df, 3).collect() == []


def test_duckdb_twin_bit_parity(spark):
    edges = [(i % 9, (i * 3 + 1) % 9) for i in range(30)] + [(0, 8)]
    got = _run_eff(spark, edges, 6)
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = effective_diameter_sql(
        f"src AS (SELECT * FROM (VALUES {vals}) t(src, dst))", max_t=6
    )
    cur = duckdb.connect().execute(sql)
    cols = [d[0] for d in cur.description]
    want = dict(zip(cols, cur.fetchone()))
    assert got == want


def test_harmonic_sql_unchanged_by_refactor(spark):
    # the shared-prefix refactor must leave harmonic_sql's output intact
    from warcsum_spark.operators.hyperball import harmonic_exact, harmonic_sql

    edges = [(i % 7, (i + 1) % 7) for i in range(7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["reached"], r["harmonic"])
        for r in harmonic_exact(df, 4).collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = harmonic_sql(
        f"src AS (SELECT * FROM (VALUES {vals}) t(src, dst))", max_t=4
    )
    cur = duckdb.connect().execute(sql)
    want = {r[0]: (r[1], r[2]) for r in cur.fetchall()}
    assert got == want


def test_final_plan_python_free(spark):
    df = spark.createDataFrame(PATH, "src long, dst long")
    plan = (
        effective_diameter(df, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

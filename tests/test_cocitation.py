"""operators/cocitation.py (T99) — co-citation related pages: a
pure-Python twin, the hub fan-out cap (directory pages mint no pairs
AND leave the in-degree base), multi-edge collapse, min_common, the
Jaccard pin, DuckDB twin bit parity, and the Python-free plan."""

from __future__ import annotations

from itertools import combinations

import duckdb
import pytest

from warcsum_spark.operators.cocitation import cocitation, cocitation_sql


def _py_ref(edges, min_common=2, max_fanout=64):
    e = set(edges)
    outd = {}
    for s, d in e:
        outd.setdefault(s, set()).add(d)
    capped = {s: ds for s, ds in outd.items() if len(ds) <= max_fanout}
    indeg = {}
    pairs = {}
    for s, ds in capped.items():
        for d in ds:
            indeg[d] = indeg.get(d, 0) + 1
        for a, b in combinations(sorted(ds), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    out = {}
    for (a, b), c in pairs.items():
        if c >= min_common:
            out[(a, b)] = {
                "common": c,
                "indeg_a": indeg[a],
                "indeg_b": indeg[b],
                "jaccard": round(c / (indeg[a] + indeg[b] - c), 6),
            }
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["a"], r["b"]): r.asDict() for r in cocitation(df, **kw).collect()
    }


def test_python_reference_twin(spark):
    edges = [
        (r, t)
        for r in range(12)
        for t in [100 + (r % 3) * 2, 101 + (r % 3) * 2, 200]
    ]
    got = _run(spark, edges, min_common=2, max_fanout=64)
    ref = _py_ref(edges, min_common=2, max_fanout=64)
    assert set(got) == set(ref)
    for k in ref:
        for c, v in ref[k].items():
            assert got[k][c] == v, (k, c)


def test_hub_cap_drops_directory_referrers_entirely(spark):
    block = [(r, 100 + t) for r in range(5) for t in (0, 1)]
    hub = [(999, 100 + t) for t in range(20)]
    capped = _run(spark, block + hub, min_common=2, max_fanout=10)
    # the hub's pairs are gone AND its contribution to in-degrees too
    assert capped[(100, 101)]["common"] == 5
    assert capped[(100, 101)]["indeg_a"] == 5  # not 6
    assert capped[(100, 101)]["jaccard"] == 1.0
    # without the cap the hub mints 190 pairs
    uncapped = _run(spark, block + hub, min_common=1, max_fanout=100)
    assert len(uncapped) == 190


def test_multi_edges_collapse_to_one_referrer(spark):
    edges = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)]
    got = _run(spark, edges, min_common=2)
    assert got[(10, 11)]["common"] == 2


def test_min_common_filters(spark):
    edges = [(1, 10), (1, 11), (2, 10), (2, 12)]
    assert _run(spark, edges, min_common=2) == {}
    one = _run(spark, edges, min_common=1)
    assert set(one) == {(10, 11), (10, 12)}  # 11,12 share no referrer


def test_duckdb_twin_bit_parity(spark):
    edges = [(i % 9, 50 + ((i * i) % 7)) for i in range(120)] + [
        (999, 50 + t) for t in range(7)
    ]
    got = _run(spark, edges, min_common=2, max_fanout=5)
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = cocitation_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        min_common=2,
        max_fanout=5,
    )
    cur = duckdb.connect().execute(sql)
    cols = [d[0] for d in cur.description]
    want = {
        (r[0], r[1]): dict(zip(cols, r)) for r in cur.fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], k


def test_plan_python_free(spark):
    df = spark.createDataFrame([(1, 10), (1, 11)], "src long, dst long")
    plan = cocitation(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan

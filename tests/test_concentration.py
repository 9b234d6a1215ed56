"""operators/concentration.py (T97) — HHI + Gini of docs-per-host: a
pure-Python twin, closed-form pins (uniform → gini (n−1)-scaled floor,
monopoly → hhi 1), tie invariance, bit-equal partitioning invariance,
DuckDB twin parity, and the Python-free plan contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.concentration import (
    host_concentration,
    host_concentration_sql,
)


def _py_ref(hosts):
    from collections import Counter

    cnt = Counter(hosts)
    cs = sorted(cnt.values())
    n = len(cs)
    s = sum(cs)
    ranked = sum((i + 1) * c for i, c in enumerate(cs))
    return {
        "n_hosts": n,
        "n_docs": s,
        "hhi": round(sum(c * c for c in cs) / (s * s), 6),
        "gini": round((2 * ranked - (n + 1) * s) / (n * s), 6),
        "max_share": round(max(cs) / s, 6),
    }


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return host_concentration(df).collect()[0].asDict()


def test_python_reference_twin(spark):
    hosts = (
        ["mega"] * 50 + ["mid"] * 20 + [f"s{i}" for i in range(30)]
    )
    got = _run(spark, hosts)
    ref = _py_ref(hosts)
    for k, v in ref.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=1e-6), k
        else:
            assert got[k] == v, k


def test_uniform_distribution_floors(spark):
    # 10 hosts × 7 docs: hhi = 1/10, gini = 0 exactly
    hosts = [f"h{i}" for i in range(10) for _ in range(7)]
    got = _run(spark, hosts)
    assert got["hhi"] == pytest.approx(0.1, abs=1e-6)
    assert got["gini"] == 0.0
    assert got["max_share"] == pytest.approx(0.1, abs=1e-6)


def test_monopoly_tops_out(spark):
    got = _run(spark, ["only"] * 31)
    assert got["hhi"] == 1.0 and got["max_share"] == 1.0
    assert got["gini"] == 0.0  # one host: no inequality AMONG hosts


def test_more_skew_more_concentration(spark):
    flat = _run(spark, [f"h{i % 20}" for i in range(200)])
    skew = _run(spark, ["big"] * 181 + [f"h{i}" for i in range(19)])
    assert skew["hhi"] > flat["hhi"]
    assert skew["gini"] > flat["gini"]


def test_partitioning_invariance_bit_equal(spark):
    hosts = [f"h{(i * i) % 13}" for i in range(300)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    a = host_concentration(df.repartition(1)).collect()[0].asDict()
    b = host_concentration(df.repartition(11)).collect()[0].asDict()
    assert a == b


def test_duckdb_twin_bit_parity(spark):
    hosts = ["a"] * 9 + ["b"] * 3 + ["c"] * 3 + ["d"]
    got = _run(spark, hosts)
    vals = ", ".join(f"('{h}')" for h in hosts)
    sql = host_concentration_sql(
        f"SELECT * FROM (VALUES {vals}) t(host)"
    )
    cur = duckdb.connect().execute(sql)
    want = dict(zip([d[0] for d in cur.description], cur.fetchall()[0]))
    assert got == want  # bit parity — ties rank differently but the
    # Gini sum is tie-invariant (equal c ⇒ equal contribution)


def test_plan_python_free(spark):
    df = spark.createDataFrame([("h",)], "host string")
    plan = (
        host_concentration(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

"""operators/drift_cat.py (T102) — chi-square categorical drift: a
pure-Python twin, identical-mix zero, new/vanished category paths, a
hand-checked 2×2 pin, bit-equal partitioning invariance, DuckDB twin
parity, and the Python-free plan contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.drift_cat import (
    categorical_drift,
    categorical_drift_sql,
)


def _py_ref(a_cats, b_cats):
    from collections import Counter

    ca, cb = Counter(a_cats), Counter(b_cats)
    cats = sorted(set(ca) | set(cb))
    n_a, n_b = sum(ca.values()), sum(cb.values())
    n = n_a + n_b
    out = {}
    for cat in cats:
        a, b = ca.get(cat, 0), cb.get(cat, 0)
        t = a + b
        contrib_a = (
            round(((a * n - n_a * t) ** 2) / (n_a * t * n), 6) if t else 0.0
        )
        contrib_b = (
            round(((b * n - n_b * t) ** 2) / (n_b * t * n), 6) if t else 0.0
        )
        out[cat] = {
            "n_a": a,
            "n_b": b,
            "share_a": round(a / n_a, 6),
            "share_b": round(b / n_b, 6),
            "contrib_a": contrib_a,
            "contrib_b": contrib_b,
        }
    chi2 = (
        sum(round(v["contrib_a"] * 1e6) for v in out.values())
        + sum(round(v["contrib_b"] * 1e6) for v in out.values())
    ) / 1e6
    for v in out.values():
        v["chi2"] = round(chi2, 6)
        v["dof"] = len(cats) - 1
    return out


def _run(spark, a_cats, b_cats):
    da = spark.createDataFrame([(c,) for c in a_cats], "lang string")
    db = spark.createDataFrame([(c,) for c in b_cats], "lang string")
    return {
        r["category"]: r.asDict()
        for r in categorical_drift(da, db).collect()
    }


def test_python_reference_twin(spark):
    a = ["en"] * 60 + ["de"] * 30 + ["fr"] * 10
    b = ["en"] * 40 + ["de"] * 35 + ["fr"] * 5 + ["xx"] * 20
    got = _run(spark, a, b)
    ref = _py_ref(a, b)
    assert set(got) == set(ref)
    for cat in ref:
        for k, v in ref[cat].items():
            if isinstance(v, float):
                assert got[cat][k] == pytest.approx(v, abs=2e-6), (cat, k)
            else:
                assert got[cat][k] == v, (cat, k)


def test_identical_mix_is_zero(spark):
    a = ["en"] * 50 + ["de"] * 50
    got = _run(spark, a, list(a))
    assert all(r["chi2"] == 0.0 for r in got.values())
    assert all(
        r["contrib_a"] == 0.0 and r["contrib_b"] == 0.0
        for r in got.values()
    )


def test_hand_checked_two_by_two(spark):
    # A: 30 en / 10 de; B: 10 en / 30 de → chi2 = 20 exactly
    a = ["en"] * 30 + ["de"] * 10
    b = ["en"] * 10 + ["de"] * 30
    got = _run(spark, a, b)
    assert got["en"]["chi2"] == pytest.approx(20.0, abs=1e-5)
    assert got["en"]["dof"] == 1


def test_new_and_vanished_categories(spark):
    got = _run(spark, ["en"] * 10 + ["old"] * 5, ["en"] * 10 + ["new"] * 5)
    assert got["old"]["n_b"] == 0 and got["old"]["share_b"] == 0.0
    assert got["new"]["n_a"] == 0
    assert got["new"]["contrib_b"] > 0


def test_partitioning_invariance_bit_equal(spark):
    a = [f"l{i % 7}" for i in range(200)]
    b = [f"l{(i * 3) % 8}" for i in range(150)]
    da = spark.createDataFrame([(c,) for c in a], "lang string")
    db = spark.createDataFrame([(c,) for c in b], "lang string")
    x = {
        r["category"]: r.asDict()
        for r in categorical_drift(da.repartition(1), db.repartition(1)).collect()
    }
    y = {
        r["category"]: r.asDict()
        for r in categorical_drift(da.repartition(9), db.repartition(5)).collect()
    }
    assert x == y


def test_duckdb_twin_bit_parity(spark):
    a = ["en"] * 12 + ["de"] * 7 + ["fr"]
    b = ["en"] * 5 + ["de"] * 9 + ["xx"] * 2
    got = _run(spark, a, b)

    def vals(cs):
        return "SELECT * FROM (VALUES " + ", ".join(
            f"('{c}')" for c in cs
        ) + ") t(lang)"

    sql = categorical_drift_sql(vals(a), vals(b))
    cur = duckdb.connect().execute(sql)
    cols = [d[0] for d in cur.description]
    want = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    for cat in got:
        for k in ("n_a", "n_b", "share_a", "share_b", "contrib_a",
                  "contrib_b", "chi2", "dof"):
            assert got[cat][k] == want[cat][k], (cat, k)


def test_plan_python_free(spark):
    da = spark.createDataFrame([("en",)], "lang string")
    plan = (
        categorical_drift(da, da)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

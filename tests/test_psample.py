"""operators/psample.py (T84) — deterministic priority sampling:
pure-Python reference twin (md5 uniform, w/u priority, top-k, DLT tau
estimator), partitioning invariance, salted == unsalted, untruncated
strata report exact weights, and the Python-free plan contract."""

from __future__ import annotations

import hashlib

import pytest

from warcsum_spark.operators.psample import priority_sample, uniform_sql

_TWO_52 = float(1 << 52)


def _py_u(doc_id: int, seed: int = 42) -> float:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return (int(h[:13], 16) + 1) / _TWO_52


def _py_ref(rows, k, seed=42):
    """rows: (stratum, id, weight) → {(stratum, id): est_weight} plus
    the selected id set, straight from the paper's definition."""
    by_s = {}
    for s, i, w in rows:
        by_s.setdefault(s, []).append((w / _py_u(i, seed), i, w))
    out = {}
    for s, items in by_s.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tau = items[k][0] if len(items) > k else None
        for pri, i, w in items[:k]:
            out[(s, i)] = w if tau is None else max(w, tau)
    return out


def _rows(n, strata=("en", "de", "fr")):
    return [
        (strata[i % len(strata)], i, float(10 + (i * 37) % 900))
        for i in range(n)
    ]


def _run(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    return priority_sample(
        df, k=k, weight_col="w", stratum_col="lang", id_col="doc_id", **kw
    )


def test_matches_python_reference(spark):
    rows = _rows(90)
    got = {
        (r["stratum"], r["id"]): r["est_weight"]
        for r in _run(spark, rows, k=7).collect()
    }
    want = _py_ref(rows, k=7)
    assert set(got) == set(want)
    for key, est in want.items():
        assert got[key] == pytest.approx(est, rel=0, abs=1e-9)


def test_untruncated_stratum_reports_exact_weights(spark):
    # a stratum with <= k items loses nothing: tau is undefined and
    # every est_weight is the true weight
    rows = [("tiny", i, float(5 + i)) for i in range(4)]
    out = _run(spark, rows, k=10).collect()
    assert len(out) == 4
    for r in out:
        assert r["est_weight"] == r["weight"]


def test_estimator_covers_selection_threshold(spark):
    # in a truncated stratum every est_weight >= tau (= max(w, tau)),
    # and sampled priorities all exceed tau
    rows = _rows(60, strata=("en",))
    out = _run(spark, rows, k=5).collect()
    ref = _py_ref(rows, k=5)
    tau = min(ref.values())  # max(w, tau) >= tau; min over sample hits tau
    assert len(out) == 5
    for r in out:
        assert r["est_weight"] >= tau - 1e-9
        assert r["priority"] > tau - 1e-9


def test_partitioning_invariance(spark):
    rows = _rows(80)
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    one = priority_sample(df.coalesce(1), 6, "w", "lang", "doc_id")
    many = priority_sample(df.repartition(13), 6, "w", "lang", "doc_id")
    key = lambda r: (r["stratum"], r["id"], r["weight"], r["priority"])
    assert sorted(map(key, one.collect())) == sorted(map(key, many.collect()))


def test_salted_equals_unsalted(spark):
    rows = _rows(120)
    plain = _run(spark, rows, k=9).collect()
    salted = _run(spark, rows, k=9, salt_buckets=8).collect()
    key = lambda r: (r["stratum"], r["id"], r["priority"], r["est_weight"])
    assert sorted(map(key, plain)) == sorted(map(key, salted))


def test_uniform_sql_twin_matches_python():
    duckdb = pytest.importorskip("duckdb")
    ids = [0, 1, 7, 12345, 10**12]
    expr = uniform_sql("i", seed=42)
    got = duckdb.sql(
        f"SELECT i, {expr} AS u FROM (SELECT unnest({ids}) AS i)"
    ).fetchall()
    for i, u in got:
        assert u == _py_u(i)  # exact — both sides are integer/2^52


def test_rejects_bad_k(spark):
    df = spark.createDataFrame(_rows(5), "lang string, doc_id long, w double")
    with pytest.raises(ValueError):
        priority_sample(df, 0, "w", "lang", "doc_id")


def test_plan_is_python_free(spark):
    rows = _rows(50)
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    plan = priority_sample(df, 5, "w", "lang", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan

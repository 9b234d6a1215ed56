"""operators/unimax.py (T104) — UniMax waterfilling: a pure-Python
twin, the all-capped and none-capped regimes, a hand-computed pin,
budget conservation, tie-break determinism, DuckDB twin bit parity,
and the Python-free plan."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.unimax import (
    language_sizes,
    unimax_budgets,
    unimax_sql,
)


def _py_ref(sizes, budget, max_epochs):
    """First-principles waterfilling (ascending capacity, lang
    tie-break; capped set is a prefix)."""
    rows = sorted(
        ((s * max_epochs, lang, s) for lang, s in sizes),
        key=lambda x: (x[0], x[1]),
    )
    n = len(rows)
    out, cs, t, cs_t = {}, 0, 0, 0
    for i, (c, lang, s) in enumerate(rows, 1):
        capped = c * (n - i + 1) <= budget - cs
        cs += c
        if capped:
            t, cs_t = i, cs
        out[lang] = {
            "size": s,
            "capacity": c,
            "allocated": float(c) if capped else None,
            "capped": capped,
        }
    share = round((budget - cs_t) / (n - t), 6) if t < n else None
    for v in out.values():
        if not v["capped"]:
            v["allocated"] = share
        v["epochs"] = round(v["allocated"] / v["size"], 6)
    return out


def _run(spark, sizes, budget, max_epochs):
    df = spark.createDataFrame(list(sizes), "lang string, size long")
    got = unimax_budgets(df, budget, max_epochs).collect()
    return {r["lang"]: r.asDict() for r in got}


SIZES = [("en", 900), ("de", 120), ("fr", 80), ("sw", 9), ("yo", 2)]


def test_python_reference_twin(spark):
    got = _run(spark, SIZES, budget=600, max_epochs=4)
    ref = _py_ref(SIZES, budget=600, max_epochs=4)
    assert set(got) == set(ref)
    for lang, v in ref.items():
        for c in ("size", "capacity", "allocated", "epochs", "capped"):
            assert got[lang][c] == v[c], (lang, c)


def test_hand_pin_mixed_regime(spark):
    # capacities (E=2): yo 4, sw 18, fr 160, de 240, en 1800; B=400.
    # yo: 4*5=20<=400 capped; sw: 18*4=72<=396 capped; fr: 160*3=480
    # <= 378? no -> uniform share (400-22)/3 = 126.0 for fr/de/en.
    got = _run(spark, SIZES, budget=400, max_epochs=2)
    assert got["yo"]["capped"] and got["yo"]["allocated"] == 4.0
    assert got["sw"]["capped"] and got["sw"]["allocated"] == 18.0
    for lang in ("fr", "de", "en"):
        assert not got[lang]["capped"]
        assert got[lang]["allocated"] == 126.0
    assert got["en"]["epochs"] == 0.14  # 126/900
    assert got["yo"]["epochs"] == 2.0  # epoch cap binds


def test_all_capped_when_budget_exceeds_total_capacity(spark):
    got = _run(spark, SIZES, budget=10**9, max_epochs=3)
    for lang, size in SIZES:
        assert got[lang]["capped"]
        assert got[lang]["allocated"] == float(size * 3)
        assert got[lang]["epochs"] == 3.0


def test_none_capped_uniform_split(spark):
    got = _run(spark, SIZES, budget=5, max_epochs=1)
    for lang, _ in SIZES:
        assert not got[lang]["capped"]
        assert got[lang]["allocated"] == 1.0


def test_budget_conservation(spark):
    for budget in (5, 37, 400, 1111, 10**9):
        got = _run(spark, SIZES, budget=budget, max_epochs=2)
        total_cap = sum(s * 2 for _, s in SIZES)
        assert sum(v["allocated"] for v in got.values()) == pytest.approx(
            min(budget, total_cap), abs=1e-4
        )


def test_equal_sizes_tie_break_deterministic(spark):
    sizes = [("b", 10), ("a", 10), ("c", 10)]
    got = _run(spark, sizes, budget=25, max_epochs=1)
    ref = _py_ref(sizes, budget=25, max_epochs=1)
    for lang in ("a", "b", "c"):
        assert got[lang]["allocated"] == ref[lang]["allocated"]
        assert got[lang]["capped"] == ref[lang]["capped"]


def test_language_sizes_is_the_corpus_agg(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(30)],
        "doc_id long, lang string",
    )
    got = {r["lang"]: r["size"] for r in language_sizes(docs).collect()}
    assert got == {"en": 20, "de": 10}


def test_duckdb_twin_bit_parity(spark):
    for budget, epochs in ((400, 2), (600, 4), (5, 1), (10**9, 3)):
        got = _run(spark, SIZES, budget=budget, max_epochs=epochs)
        vals = ", ".join(f"('{l}', {s})" for l, s in SIZES)
        sql = unimax_sql(
            f"SELECT * FROM (VALUES {vals}) t(lang, size)",
            budget=budget,
            max_epochs=epochs,
        )
        cur = duckdb.connect().execute(sql)
        cols = [d[0] for d in cur.description]
        want = {r[cols.index("lang")]: dict(zip(cols, r)) for r in cur.fetchall()}
        assert set(got) == set(want)
        for lang in got:
            for c in ("size", "capacity", "allocated", "epochs", "capped"):
                assert got[lang][c] == want[lang][c], (budget, lang, c)


def test_plan_python_free(spark):
    df = spark.createDataFrame(SIZES, "lang string, size long")
    plan = (
        unimax_budgets(df, 100, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

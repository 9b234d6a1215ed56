"""operators/goodturing.py (T125) — Simple Good-Turing: an
independent Python twin of the full pinned chain (Z transform, OLS
line, LGT/Turing switch rule, exact normalizer), the Gale & Sampson
textbook sanity properties (p0 = N1/N, r* < r under a falling line,
probabilities summing to 1), the switch-rule pins, degenerate-fit
NULLs, validation, partitioning invariance, and DuckDB twin parity."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from warcsum_spark.operators.goodturing import (
    good_turing,
    good_turing_oracle_sql,
)

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_ref(texts, confidence=1.65):
    counts = {}
    for t in texts:
        for w in WS.split((t or "").lower().strip()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    ff = {}
    for r in counts.values():
        ff[r] = ff.get(r, 0) + 1
    rs = sorted(ff)
    if not rs:
        return {}
    big_n = sum(r * n for r, n in ff.items())
    n1 = ff.get(1)
    # Z transform with neighbor averaging
    z = {}
    for i, r in enumerate(rs):
        q = rs[i - 1] if i > 0 else 0
        t = rs[i + 1] if i + 1 < len(rs) else 2 * r - q
        z[r] = 2.0 * ff[r] / (t - q)
    # OLS over 1e8-scaled integer ln points (the engine's exact sums)
    pts = [
        (round(math.log(r) * 1e8), round(math.log(z[r]) * 1e8)) for r in rs
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    vx = n * sxx - sx * sx
    b9 = round((n * sxy - sx * sy) / vx, 9) if n >= 2 and vx != 0 else None

    out = {}
    if b9 is None:
        p0 = round(n1 / big_n, 8) if n1 else 0.0
        for r in rs:
            out[r] = (ff[r], round(z[r], 6), None, None, p0, None)
        return out

    lgt, turing, flagged = {}, {}, {}
    for i, r in enumerate(rs):
        lgt[r] = round(
            r * round(math.exp(round((b9 + 1.0) * round(math.log((r + 1) / r), 9), 9)), 9),
            9,
        )
        nr1 = ff.get(rs[i + 1]) if i + 1 < len(rs) and rs[i + 1] == r + 1 else None
        if nr1 is not None:
            turing[r] = (r + 1) * nr1 / ff[r]
            thr = confidence * math.sqrt(
                (r + 1) ** 2 * (nr1 / ff[r] / ff[r]) * (1.0 + nr1 / ff[r])
            )
            flagged[r] = abs(turing[r] - lgt[r]) <= thr
        else:
            flagged[r] = True
    switch = min(r for r in rs if flagged[r])
    star, method = {}, {}
    for r in rs:
        if r < switch:
            star[r], method[r] = round(turing[r], 9), "T"
        else:
            star[r], method[r] = lgt[r], "LGT"
    norm9 = sum(ff[r] * round(star[r] * 1e9) for r in rs)
    p0 = n1 / big_n if n1 else 0.0
    for r in rs:
        p_word = (1.0 - p0) * star[r] / (norm9 / 1e9)
        out[r] = (
            ff[r],
            round(z[r], 6),
            round(star[r], 6),
            method[r],
            round(p0, 8),
            round(p_word, 8),
        )
    return out


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    res = good_turing(df, **kw)
    return {r["r"]: tuple(r)[1:] for r in res.collect()}


def _zipfish():
    # a Zipf-flavored corpus: word of rank i appears max(1, 800//i)
    # times over a 1000-word vocabulary — a large-N1 falling
    # frequency-of-frequencies curve whose switch point sits past r=1,
    # so BOTH the Turing and the LGT regime appear in the output
    texts = []
    for i in range(1, 1001):
        texts.append(" ".join(f"w{i}" for _ in range(max(1, 800 // i))))
    return texts


def test_python_twin(spark):
    texts = _zipfish()
    assert _run(spark, texts) == _py_ref(texts)


def test_textbook_properties(spark):
    texts = _zipfish()
    got = _run(spark, texts)
    rs = sorted(got)
    n1 = got[1][0]
    big_n = sum(r * got[r][0] for r in rs)
    # p0 is exactly N1/N
    assert got[rs[0]][4] == round(n1 / big_n, 8)
    # discounting: every smoothed count sits below its raw count
    assert all(got[r][2] < r for r in rs)
    # total probability mass is 1: p0 + Σ N_r·p_word
    mass = got[rs[0]][4] + sum(got[r][0] * got[r][5] for r in rs)
    assert abs(mass - 1.0) < 1e-6
    # both regimes appear and the switch is a clean prefix
    methods = [got[r][3] for r in rs]
    assert "T" in methods and "LGT" in methods
    first_lgt = methods.index("LGT")
    assert all(m == "LGT" for m in methods[first_lgt:])


def test_missing_nr1_forces_switch(spark):
    # gap right after the smallest r: r=1 observed, r=2 NOT observed →
    # Turing is undefined at r=1, so the switch fires immediately and
    # EVERY row is LGT
    texts = ["a b c", "d d d e e e"]  # counts: 1,1,1,3,3 → ff {1:3, 3:2}
    got = _run(spark, texts)
    assert sorted(got) == [1, 3]
    assert got[1][3] == "LGT" and got[3][3] == "LGT"


def test_degenerate_single_r(spark):
    # every word occurs exactly twice → one ff row → no line to fit
    texts = ["x x y y", "z z"]
    got = _run(spark, texts)
    assert sorted(got) == [2]
    n_r, z_r, r_star, method, p0, p_word = got[2]
    assert n_r == 3 and r_star is None and method is None and p_word is None
    assert p0 == 0.0  # N1 unobserved
    assert got == _py_ref(texts)


def test_param_validation(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError, match="confidence"):
        good_turing(df, confidence=0)


def test_partitioning_invariance(spark):
    texts = _zipfish()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = sorted(map(tuple, good_turing(df).collect()))
    b = sorted(map(tuple, good_turing(df.repartition(7)).collect()))
    assert a == b


def test_duckdb_twin_parity(spark):
    texts = _zipfish()
    docs_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"('{t}')" for t in texts
    ) + ") AS t(text)"
    sql = good_turing_oracle_sql(docs_sql)
    ora = {r[0]: tuple(r)[1:] for r in duckdb.sql(sql).fetchall()}
    assert _run(spark, texts) == ora


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("a a b",)], "text string")
    plan = good_turing(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan

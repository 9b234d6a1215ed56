"""operators/knlm.py (T88) — interpolated Kneser-Ney bigram LM:
pure-Python reference twin, hand-computed probability pin, the
mass-conservation invariant, min_count output filter, the generated
DuckDB twin (bit-for-bit), bad-discount rejection, and the Python-free
plan contract."""

from __future__ import annotations

import re

import pytest

from warcsum_spark.operators.knlm import kn_bigram_lm, kn_bigram_sql

D = 0.75


def _py_ref(texts, min_count=1):
    """{(w1,w2): (c12, c1, n1p, nc, prob)} by literal counting."""
    bi = {}
    for t in texts:
        ws = [w for w in re.split(r"\s+", t.lower().strip()) if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c1, n1p, nc = {}, {}, {}
    for (a, b), c in bi.items():
        c1[a] = c1.get(a, 0) + c
        n1p[a] = n1p.get(a, 0) + 1
        nc[b] = nc.get(b, 0) + 1
    nbt = len(bi)
    out = {}
    for (a, b), c in bi.items():
        if c < min_count:
            continue
        prob = max(c - D, 0.0) / c1[a] + ((D * n1p[a]) / c1[a]) * (
            nc[b] / nbt
        )
        out[(a, b)] = (c, c1[a], n1p[a], nc[b], round(prob, 6))
    return out


_TEXTS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
]


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["n1p"], r["nc"], r["prob"])
        for r in kn_bigram_lm(df, **kw).collect()
    }


def test_matches_python_reference(spark):
    assert _run(spark, _TEXTS) == _py_ref(_TEXTS)


def test_hand_computed_probability(spark):
    # corpus "a b a b a c": bigrams ab×2, ba×2, ac×1 → c1(a)=3, n1p(a)=2,
    # nc(b)=1, nbt=3 → p(b|a) = (2-.75)/3 + (.75·2/3)·(1/3) = 0.583333
    got = _run(spark, ["a b a b a c"])
    assert got[("a", "b")] == (2, 3, 2, 1, pytest.approx(0.583333))
    assert got[("a", "c")] == (1, 3, 2, 1, pytest.approx(0.25))
    # (b,a): c1(b)=2, n1p(b)=1, nc(a)=1 (only b precedes a) →
    # (2-.75)/2 + (.75·1/2)·(1/3) = 0.75
    assert got[("b", "a")] == (2, 2, 1, 1, pytest.approx(0.75))


def test_mass_conservation_per_context(spark):
    """Σ_w2 [(c12-D)/c1] + D·n1p/c1 == 1 for every observed context —
    the interpolated-KN normalization identity (Σ p_cont over the full
    vocab is 1 because Σ nc = nbt)."""
    got = _run(spark, _TEXTS)
    by_ctx = {}
    for (a, _), (c12, c1, n1p, _nc, _p) in got.items():
        disc, lam = by_ctx.get(a, (0.0, None))
        by_ctx[a] = (disc + (c12 - D) / c1, D * n1p / c1)
    for a, (disc_mass, lam) in by_ctx.items():
        assert disc_mass + lam == pytest.approx(1.0), a


def test_min_count_trims_output_not_normalizers(spark):
    full = _run(spark, _TEXTS)
    trimmed = _run(spark, _TEXTS, min_count=2)
    assert trimmed == {k: v for k, v in full.items() if v[0] >= 2}
    assert len(trimmed) < len(full)


def test_duckdb_twin_matches_bit_for_bit(spark):
    duckdb = pytest.importorskip("duckdb")
    from warcsum_spark.functions.quality import WS_CLASS

    vals = ", ".join("('" + t + "')" for t in _TEXTS)
    sql = kn_bigram_sql(f"src(text) AS (VALUES {vals})", WS_CLASS)
    got = {(a, b): tuple(rest) for a, b, *rest in duckdb.sql(sql).fetchall()}
    assert got == _run(spark, _TEXTS)


def test_rejects_bad_discount(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    for d in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError):
            kn_bigram_lm(df, discount=d)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        kn_bigram_lm(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

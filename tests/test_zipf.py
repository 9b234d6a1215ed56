"""operators/zipf.py (T90) — Zipf/Heaps corpus-law diagnostics: a
pure-Python OLS reference twin, a synthetic exactly-Zipfian corpus,
degenerate-sample NULLs, top-rank truncation, partitioning invariance,
DuckDB twin bit parity, and the Python-free plan contract."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from warcsum_spark.operators.zipf import SCALE, corpus_laws, corpus_laws_sql

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_ref(texts: list[str], max_rank: int = 1000) -> dict:
    docs = []
    for t in texts:
        norm = re.sub("^ | $", "", WS.sub(" ", (t or "").lower()))
        if norm:
            docs.append(norm.split(" "))
    vocab: dict[str, int] = {}
    for ws in docs:
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
    head = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:max_rank]

    def sl(v: int) -> int:
        return round(math.log(v) * SCALE)

    def ols(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        if n < 2 or vx == 0:
            return None, None, None
        slope = cov / vx
        intercept = ((sy - slope * sx) / n) / SCALE
        r2 = (cov * cov) / (vx * vy) if vy != 0 else None
        return slope, intercept, r2

    zs, zi, zr = ols([(sl(i + 1), sl(c)) for i, (_, c) in enumerate(head)])
    hs, hi, hr = ols([(sl(len(ws)), sl(len(set(ws)))) for ws in docs])
    rnd = lambda v: None if v is None else round(v, 6)  # noqa: E731
    return {
        "n_docs": len(docs),
        "n_tokens": sum(vocab.values()),
        "n_vocab": len(vocab),
        "zipf_slope": rnd(zs),
        "zipf_intercept": rnd(zi),
        "zipf_r2": rnd(zr),
        "heaps_beta": rnd(hs),
        "heaps_k": None if hi is None else round(math.exp(hi), 6),
        "heaps_r2": rnd(hr),
    }


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return corpus_laws(df, **kw).collect()[0].asDict()


def test_python_reference_twin(spark):
    texts = [
        "the cat sat on the mat the end",
        "the dog and the cat ran",
        "a b c d e f g the the the",
        "zebra yak xenon the a a",
        "",
        None,
    ]
    got = _run(spark, texts)
    ref = _py_ref(texts)
    for k, v in ref.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=2e-6), (k, got[k], v)
        else:
            assert got[k] == v, k


def test_exact_zipf_corpus_recovers_slope_minus_one(spark):
    # word w_r appears round(1200/r) times → ln c ≈ ln 1200 − ln r
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1200 / r)
    # spread across docs; content not doc-structured (Zipf is corpus-level)
    texts = [" ".join(words[i::10]) for i in range(10)]
    got = _run(spark, texts)
    assert got["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
    assert got["zipf_r2"] > 0.999


def test_max_rank_truncates_the_fit(spark):
    texts = ["aa " * 50 + "bb " * 25 + "cc " * 10 + "dd ee ff gg"]
    full = _run(spark, texts, max_rank=1000)
    head2 = _run(spark, texts, max_rank=2)
    ref2 = _py_ref(texts, max_rank=2)
    assert head2["zipf_slope"] == pytest.approx(
        ref2["zipf_slope"], abs=2e-6
    )
    assert head2["zipf_slope"] != full["zipf_slope"]
    # corpus totals are NOT truncated by the fit window
    assert head2["n_vocab"] == full["n_vocab"] == 7


def test_degenerate_samples_are_null(spark):
    # single word type → 1 zipf point; every doc same length/vocab →
    # zero x-variance for heaps
    got = _run(spark, ["solo", "solo", "solo"])
    assert got["zipf_slope"] is None
    assert got["heaps_beta"] is None
    assert got["n_tokens"] == 3 and got["n_vocab"] == 1


def test_partitioning_invariance(spark):
    texts = [f"t{i % 7} u{i % 3} v w{i % 11} x y z common common" for i in range(60)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = corpus_laws(df.repartition(1)).collect()[0].asDict()
    b = corpus_laws(df.repartition(13)).collect()[0].asDict()
    assert a == b  # exact-integer sums make this bit-equal, not approx


def test_duckdb_twin_bit_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = corpus_laws(docs).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    cur = con.execute(corpus_laws_sql())
    want = dict(zip([d[0] for d in cur.description], cur.fetchall()[0]))
    assert got == want  # bit parity, not approx


def test_plan_is_python_free_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = corpus_laws(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    assert "CartesianProduct" not in plan  # one-row joins broadcast

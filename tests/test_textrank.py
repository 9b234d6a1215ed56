"""operators/textrank.py (T126) — TextRank: an independent Python
twin (pair extraction + the T32 per-round-rounded power iteration),
window/canonicalization pins, a star-graph hub pin, top-k order
determinism, validation, partitioning invariance, DuckDB twin
parity, and the Python-free plan contract."""

from __future__ import annotations

import re

import duckdb
import pytest

from warcsum_spark.operators.textrank import (
    cooccurrence_edges,
    textrank_keywords,
    textrank_oracle_sql,
)

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_edges(texts, window=2):
    out = set()
    for t in texts:
        toks = [w for w in WS.split((t or "").lower().strip()) if w]
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                a, b = sorted((toks[i], toks[j]))
                if a != b:
                    out.add((a, b))
    return out


def _py_pagerank(edges, damping=0.85, iters=6, round_scale=10):
    e = sorted(edges)
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for s, _ in e:
        out[idx[s]] += 1
    r = [round(1.0 / n, round_scale)] * n
    for _ in range(iters):
        contrib = [0.0] * n
        for s, d in e:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dm = sum(r[i] for i in range(n) if out[i] == 0)
        r = [
            round(
                (1.0 - damping) / n + damping * (contrib[i] + dm / n),
                round_scale,
            )
            for i in range(n)
        ]
    return {nodes[i]: r[i] for i in range(n)}


def _py_topk(texts, window=2, iters=6, k=50):
    und = _py_edges(texts, window)
    both = und | {(b, a) for a, b in und}
    scores = _py_pagerank(both, iters=iters)
    rows = sorted(
        ((round(s, 8), w) for w, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i + 1, w, s) for i, (s, w) in enumerate(rows)]


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [tuple(r) for r in textrank_keywords(df, **kw).collect()]


TEXTS = [
    "spark shuffles data between stages while the driver plans queries",
    "the driver plans queries and executors run tasks over data",
    "executors spill data to disk when memory pressure grows",
    "queries scan data and data feeds queries",
]


def test_python_twin(spark):
    got = _run(spark, TEXTS)
    ref = _py_topk(TEXTS)
    assert [(p, w) for p, w, _ in got] == [(p, w) for p, w, _ in ref]
    for (_, _, a), (_, _, b) in zip(got, ref):
        assert a == pytest.approx(b, abs=1e-9)


def test_window_and_no_cross_doc_pairs(spark):
    texts = ["a b c d", "x y"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(df, window=2).collect()
    }
    # distance ≤ 2 inside a doc; nothing joins doc 1 to doc 2
    assert got == {
        ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("x", "y"),
    }
    # window=1 keeps only adjacent pairs
    got1 = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(df, window=1).collect()
    }
    assert got1 == {("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")}


def test_pair_canonicalization(spark):
    # 'b a' and 'a b' are the SAME undirected edge; repeats collapse
    df = spark.createDataFrame(
        [("a b",), ("b a",), ("a b",)], "text string"
    )
    got = [tuple(r) for r in cooccurrence_edges(df, window=2).collect()]
    assert got == [("a", "b")]


def test_hub_word_wins(spark):
    # 'hub' co-occurs with every spoke; spokes only see the hub
    texts = [f"hub s{i}" for i in range(8)]
    got = _run(spark, texts, k=3)
    assert got[0][1] == "hub" and got[0][0] == 1
    assert got[0][2] > got[1][2]


def test_topk_truncation_and_ties(spark):
    # all spokes are symmetric → identical scores → word ASC breaks ties
    texts = [f"hub s{i}" for i in range(8)]
    got = _run(spark, texts, k=4)
    assert [w for _, w, _ in got] == ["hub", "s0", "s1", "s2"]
    assert [p for p, _, _ in got] == [1, 2, 3, 4]


def test_param_validation(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="window"):
        cooccurrence_edges(df, window=0)
    with pytest.raises(ValueError, match="k"):
        textrank_keywords(df, k=0)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = [tuple(r) for r in textrank_keywords(df).collect()]
    b = [tuple(r) for r in textrank_keywords(df.repartition(7)).collect()]
    assert a == b


def test_duckdb_twin_parity(spark):
    docs_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"('{t}')" for t in TEXTS
    ) + ") AS t(text)"
    ora = [tuple(r) for r in duckdb.sql(textrank_oracle_sql(docs_sql)).fetchall()]
    assert _run(spark, TEXTS) == ora


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        textrank_keywords(df, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

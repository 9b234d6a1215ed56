"""operators/wand.py (T109) — WAND/MaxScore term upper bounds: a
pure-Python twin, the single-doc hand pin, the BOUND invariant vs
T69's bm25_search (every per-term contribution <= ub; every query
score <= sum of its terms' ubs), argmax tie -> smallest doc, min_df
gating, empty-doc handling, bit-equal partitioning invariance, DuckDB
twin parity, and the Python-free plan contract."""

from __future__ import annotations

import math

import duckdb
import pytest

from warcsum_spark.operators.bm25 import bm25_search
from warcsum_spark.operators.wand import (
    wand_upper_bounds,
    wand_upper_bounds_sql,
)

K1, B = 1.2, 0.75


def _py_ref(texts, min_df=1):
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    n = len(texts)
    s = sum(len(w) for w in toks.values())
    avgdl = s / n
    per = {}
    for d, words in toks.items():
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        for w, f in tf.items():
            tfn = round(
                f * (K1 + 1.0)
                / (f + K1 * (1.0 - B + B * len(words) / avgdl)),
                9,
            )
            per.setdefault(w, []).append((tfn, d))
    out = {}
    for w, lst in per.items():
        df = len(lst)
        if df < min_df:
            continue
        tfn, d = max(lst, key=lambda p: (p[0], -p[1]))
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        out[w] = {
            "term": w,
            "df": df,
            "ub_doc_id": d,
            "max_tf_norm": tfn,
            "ub": round(idf * tfn, 6),
        }
    return out


def _run(spark, texts, min_df=1):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = wand_upper_bounds(df, min_df=min_df).collect()
    return {r["term"]: r.asDict() for r in rows}


def _check(spark, texts, min_df=1):
    got = _run(spark, texts, min_df)
    ref = _py_ref(texts, min_df)
    assert set(got) == set(ref)
    for w in ref:
        for k, v in ref[w].items():
            g = got[w][k]
            if isinstance(v, float):
                assert g == pytest.approx(v, abs=1e-9), (w, k)
            else:
                assert g == v, (w, k)
    return got


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog sleeps",
    "quick quick quick fox",
    "a lazy afternoon with a lazy dog and a lazy cat",
    "brown bread brown butter",
]


def test_python_reference_twin(spark):
    _check(spark, TEXTS)


def test_single_doc_hand_pin(spark):
    # one doc "w w": avgdl = 2, tf = 2 ->
    # tfn = 2*2.2/(2+1.2*(0.25+0.75)) = 4.4/3.2 ; idf = ln(0.5/1.5+1)
    got = _run(spark, ["w w"])
    tfn = round(4.4 / 3.2, 9)
    assert got["w"]["max_tf_norm"] == pytest.approx(tfn, abs=1e-12)
    assert got["w"]["ub"] == pytest.approx(
        round(math.log(0.5 / 1.5 + 1.0) * tfn, 6), abs=1e-9
    )
    assert got["w"]["df"] == 1 and got["w"]["ub_doc_id"] == 0


def test_bound_invariant_vs_bm25(spark):
    # sum of query-term ubs dominates every bm25 score of that query
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(1, "lazy"), (1, "dog"), (2, "quick"), (2, "brown"), (2, "the")],
        "query_id long, term string",
    )
    ubs = {r["term"]: r["ub"] for r in wand_upper_bounds(docs).collect()}
    budget = {
        1: ubs["lazy"] + ubs["dog"],
        2: ubs["quick"] + ubs["brown"] + ubs["the"],
    }
    for r in bm25_search(docs, queries, k=10).collect():
        assert r["score"] <= budget[r["query_id"]] + 1e-6


def test_per_term_contribution_never_exceeds_ub(spark):
    ref = _py_ref(TEXTS)
    # recompute every (term, doc) contribution in Python and compare
    toks = {i: t.lower().split() for i, t in enumerate(TEXTS)}
    n = len(TEXTS)
    avgdl = sum(len(w) for w in toks.values()) / n
    for d, words in toks.items():
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        for w, f in tf.items():
            tfn = f * (K1 + 1.0) / (
                f + K1 * (1.0 - B + B * len(words) / avgdl)
            )
            idf = math.log((n - ref[w]["df"] + 0.5) / (ref[w]["df"] + 0.5) + 1)
            assert idf * tfn <= ref[w]["ub"] + 1e-6


def test_tie_takes_smallest_doc(spark):
    # identical docs -> identical tf_norm; the bound doc must be doc 0
    got = _run(spark, ["same text here", "same text here"])
    for w in ("same", "text", "here"):
        assert got[w]["ub_doc_id"] == 0
        assert got[w]["df"] == 2


def test_min_df_gates(spark):
    got = _check(spark, TEXTS, min_df=2)
    assert "jumps" not in got  # df = 1
    assert "dog" in got  # df = 3


def test_empty_docs_survive(spark):
    got = _check(spark, ["", "word", "  "])
    assert set(got) == {"word"}


def test_partitioning_invariance_bit_equal(spark):
    texts = [f"t{i % 7} t{i % 3} filler{i % 11}" for i in range(100)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    a = sorted(map(tuple, wand_upper_bounds(df.repartition(1)).collect()))
    b = sorted(map(tuple, wand_upper_bounds(df.repartition(13)).collect()))
    assert a == b


def test_duckdb_twin_bit_parity(spark):
    got = _run(spark, TEXTS, min_df=2)
    con = duckdb.connect()
    con.execute("CREATE TABLE D (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO D VALUES (?, ?)", list(enumerate(TEXTS))
    )
    sql = wand_upper_bounds_sql("SELECT doc_id, text FROM D", min_df=2)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    assert set(rows) == set(got)
    for w, d in rows.items():
        for k, v in d.items():
            assert got[w][k] == v, (w, k, got[w][k], v)


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (
        wand_upper_bounds(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

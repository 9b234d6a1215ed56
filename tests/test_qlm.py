"""operators/qlm.py (T114) — Dirichlet query likelihood: a pure-Python
twin (same tokenization + decomposition), a worked hand pin, query-term
multiplicity, the length-normalization direction, partial-match
smoothing behavior, salted==unsalted top-k, and DuckDB twin parity."""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pytest

from warcsum_spark.operators.qlm import (
    query_likelihood_search,
    query_likelihood_sql,
)

MU = 10.0


def _tok(text):
    t = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip()
    return t.split(" ") if t else []


def _py_ref(docs, queries, mu=MU, k=10):
    toks = {d: _tok(t) for d, t in docs}
    c_total = sum(len(w) for w in toks.values())
    cf = Counter()
    for w in toks.values():
        cf.update(w)
    qtf = Counter(queries)  # (query_id, term) -> multiplicity
    qlen = Counter(q for q, _ in queries)
    scores = {}
    for (q, term), m in qtf.items():
        for d, w in toks.items():
            tf = w.count(term)
            if tf:
                scores.setdefault((q, d), 0.0)
                scores[(q, d)] += m * math.log(
                    1.0 + tf / (mu * cf[term] / c_total)
                )
    out = {}
    for (q, d), s in scores.items():
        out[(q, d)] = round(
            s + qlen[q] * math.log(mu / (len(toks[d]) + mu)), 6
        )
    ranked = {}
    byq = {}
    for (q, d), s in out.items():
        byq.setdefault(q, []).append((d, s))
    for q, items in byq.items():
        items.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(items[:k], 1):
            ranked[(q, d)] = (s, r)
    return ranked


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog barked at the cat and the dog ran"),
    (3, "quantum entanglement of photons"),
    (4, "cat cat cat"),
    (5, ""),
]
QUERIES = [(1, "cat"), (1, "dog"), (2, "quantum"), (3, "cat"), (3, "cat")]


def _run(spark, docs, queries, **kw):
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, term string")
    res = query_likelihood_search(ddf, qdf, mu=MU, **kw)
    return {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in res.collect()
    }


def test_python_twin(spark):
    assert _run(spark, DOCS, QUERIES) == _py_ref(DOCS, QUERIES)


def test_hand_pin_single_term(spark):
    # corpus: d1 = "a b", d2 = "a a"; query "a": cf(a)=3, |C|=4
    docs = [(1, "a b"), (2, "a a")]
    got = _run(spark, docs, [(7, "a")])
    p_c = 3.0 / 4.0
    s1 = round(math.log(1 + 1 / (MU * p_c)) + math.log(MU / (2 + MU)), 6)
    s2 = round(math.log(1 + 2 / (MU * p_c)) + math.log(MU / (2 + MU)), 6)
    assert got[(7, 2)][0] == s2 and got[(7, 1)][0] == s1
    assert got[(7, 2)][1] == 1  # higher tf, same length -> rank 1


def test_query_term_multiplicity_doubles_contribution(spark):
    docs = [(1, "x y")]
    one = _run(spark, docs, [(1, "x")])[(1, 1)][0]
    two = _run(spark, docs, [(1, "x"), (1, "x")])[(1, 1)][0]
    # doubling c(t,q) doubles BOTH the match term and the |q| length term
    assert two == pytest.approx(2 * one, abs=2e-6)


def test_length_normalization(spark):
    # same tf, longer doc -> lower score
    docs = [(1, "cat " + "filler " * 20), (2, "cat hop")]
    got = _run(spark, docs, [(1, "cat")])
    assert got[(1, 2)][0] > got[(1, 1)][0]


def test_partial_match_is_a_candidate(spark):
    got = _run(spark, DOCS, QUERIES)
    # doc 1 matches "cat" but not "dog" for query 1 — still scored
    assert (1, 1) in got
    # doc 3 matches no query-1 term — absent
    assert (1, 3) not in got


def test_zero_match_query_returns_nothing(spark):
    got = _run(spark, DOCS, [(9, "zzznope")])
    assert not any(q == 9 for q, _ in got)


def test_salted_topk_equals_unsalted(spark):
    docs = [(i, f"cat {'pad ' * (i % 7)}") for i in range(1, 60)]
    plain = _run(spark, docs, [(1, "cat")], k=10)
    salted = _run(spark, docs, [(1, "cat")], k=10, salt_buckets=8)
    assert plain == salted


def test_duckdb_twin_bit_parity(spark):
    got = _run(spark, DOCS, QUERIES)
    con = duckdb.connect()
    con.execute("CREATE TABLE D (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO D VALUES (?, ?)", DOCS)
    sql = query_likelihood_sql(
        "SELECT doc_id, text FROM D", QUERIES, k=10, mu=MU
    )
    rows = con.execute(sql).fetchall()
    ref = {(q, d): (s, r) for q, d, s, r in rows}
    assert ref == got

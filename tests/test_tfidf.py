"""operators/tfidf.py vs a pure-Python reference (pinned smooth-idf
definition) plus ranking/tie semantics and plan checks."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from warcsum_spark.operators.tfidf import tfidf_scores, top_terms

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat dog cat dog cat"),
    (3, ""),
    (4, "zebra"),
]


def _ref_scores(docs):
    words = {
        i: [w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w]
        for i, t in docs
    }
    n = len(docs)
    df = Counter()
    for ws in words.values():
        for t in set(ws):
            df[t] += 1
    out = {}
    for i, ws in words.items():
        c = Counter(ws)
        for t, tc in c.items():
            idf = math.log((n + 1) / (df[t] + 1)) + 1
            out[(i, t)] = tc / len(ws) * idf
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_reference(spark):
    got = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_scores(_df(spark)).collect()
    }
    want = _ref_scores(DOCS)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_top_terms_ranking_and_ties(spark):
    ref = _ref_scores(DOCS)
    rows = top_terms(_df(spark), k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    # doc 2: cat (tf 3/5) outranks dog (tf 2/5), same idf
    assert [t for _, t, _ in sorted(by_doc[2])] == ["cat", "dog"]
    # doc 0: 'the' has tf 2/6 but minimal idf; top term must match reference
    want_top0 = max(
        (t for (i, t) in ref if i == 0),
        key=lambda t: (ref[(0, t)], [-ord(c) for c in t]),
    )
    assert sorted(by_doc[0])[0][1] == want_top0
    # empty doc contributes no rows; singleton doc ranks its only word 1st
    assert 3 not in by_doc
    assert by_doc[4] == [(1, "zebra", by_doc[4][0][2])]


def test_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame([(0, "bb aa"), (1, "cc dd")], "doc_id long, text string")
    rows = sorted(
        (r["rank"], r["term"]) for r in top_terms(df, k=2).collect() if r["doc_id"] == 0
    )
    assert rows == [(1, "aa"), (2, "bb")]  # equal scores → smaller term first


def test_single_token_exchange(spark):
    """The token-grain shuffle happens ONCE: df is derived from the
    aggregated (doc, term) rows, never from a second explode."""
    plan = (
        top_terms(_df(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate explode") == 1, plan

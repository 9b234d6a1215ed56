"""operators/bm25.py vs a pure-Python BM25 reference (Lucene idf,
k1/b defaults pinned), plus salt-invariance, hot-query, empty-doc and
plan-shape checks."""

from __future__ import annotations

import math
import re
from collections import Counter

from warcsum_spark.operators.bm25 import bm25_search

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat dog cat dog cat"),
    (3, ""),
    (4, "zebra zebra zebra"),
    (5, "cat mat log zebra dog"),
    (6, "the the the the"),
]

QUERIES = [
    (1, "cat"), (1, "dog"),
    (2, "zebra"),
    (3, "the"),  # hot term: in 3 of 7 docs
    (4, "missing"),
]


def _ref_bm25(docs, queries, k1=1.2, b=0.75):
    words = {
        i: [w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w]
        for i, t in docs
    }
    n = len(docs)
    avgdl = sum(len(w) for w in words.values()) / n
    df = Counter()
    for ws in words.values():
        for t in set(ws):
            df[t] += 1
    per_query = {}
    for qid, term in queries:
        per_query.setdefault(qid, []).append(term)
    out = {}
    for qid, terms in per_query.items():
        for i, ws in words.items():
            c = Counter(ws)
            s = 0.0
            hit = False
            for t in terms:
                if c[t] == 0:
                    continue
                hit = True
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += (
                    idf
                    * c[t]
                    * (k1 + 1.0)
                    / (c[t] + k1 * (1.0 - b + b * len(ws) / avgdl))
                )
            if hit:
                out[(qid, i)] = round(s, 6)
    return out


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    return docs, qs


def _collect(df):
    return {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in df.collect()
    }


def test_scores_match_reference(spark):
    docs, qs = _dfs(spark)
    got = _collect(bm25_search(docs, qs, k=10))
    ref = _ref_bm25(DOCS, QUERIES)
    assert set(got) == set(ref)
    for key, (score, _) in got.items():
        assert abs(score - ref[key]) < 1e-9, (key, score, ref[key])


def test_ranking_and_k(spark):
    docs, qs = _dfs(spark)
    rows = bm25_search(docs, qs, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    ref = _ref_bm25(DOCS, QUERIES)
    for qid, rs in by_q.items():
        assert len(rs) <= 2
        rs.sort(key=lambda r: r["rank"])
        # ranks dense from 1, ordered by (score desc, doc_id asc)
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        expected = sorted(
            ((v, i) for (q, i), v in ref.items() if q == qid),
            key=lambda p: (-p[0], p[1]),
        )[:2]
        assert [(r["score"], r["doc_id"]) for r in rs] == expected


def test_salt_invariance(spark):
    docs, qs = _dfs(spark)
    plain = _collect(bm25_search(docs, qs, k=3, salt_buckets=0))
    salted = _collect(bm25_search(docs, qs, k=3, salt_buckets=7))
    assert plain == salted


def test_unmatched_query_and_empty_doc(spark):
    docs, qs = _dfs(spark)
    got = _collect(bm25_search(docs, qs, k=10))
    assert not any(q == 4 for q, _ in got)  # term absent from corpus
    assert not any(d == 3 for _, d in got)  # empty doc never scores


def test_plan_shape(spark):
    """Query-vocabulary and df joins broadcast; no cartesian product
    except the one-row stats broadcast."""
    docs, qs = _dfs(spark)
    plan = bm25_search(docs, qs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan

"""T30 inverted index: df/cf/postings vs an independent reference, the
hot-term posting cap, and shared-tokenizer consistency."""

from __future__ import annotations

import re

from warcsum_spark.operators.inverted_index import build_inverted_index

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ref(rows):
    stats: dict[str, dict] = {}
    for doc_id, text in rows:
        toks = [t for t in WS.split(text.strip())] if text.strip() else []
        for t in toks:
            s = stats.setdefault(t, {"cf": 0, "docs": set()})
            s["cf"] += 1
            s["docs"].add(doc_id)
    return {
        t: (len(s["docs"]), s["cf"], sorted(s["docs"]))
        for t, s in stats.items()
    }


def _rows():
    return [
        (1, "the cat sat on the mat"),
        (2, "the dog  sat\t on the log"),  # whitespace runs normalize
        (3, "cat and dog and cat"),
        (4, ""),  # empty doc contributes nothing
        (5, "the the the"),
    ]


def test_matches_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["cf"], list(r["postings"]))
        for r in build_inverted_index(df).collect()
    }
    assert got == _ref(rows)


def test_hot_term_posting_cap(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: r for r in build_inverted_index(df, max_postings=2).collect()
    }
    # 'the' (df=3) and 'sat'/'cat'/... check: df>2 → stats exact, postings null
    assert got["the"]["df"] == 3 and got["the"]["cf"] == 7
    assert got["the"]["postings"] is None
    # df<=2 terms keep full lists
    assert list(got["dog"]["postings"]) == [2, 3]
    assert list(got["mat"]["postings"]) == [1]


def test_cap_filters_before_collection(spark):
    """Plan shape: with a cap, ineligible doc ids are nulled BEFORE the
    posting aggregation (collect_list skips nulls, so hot terms buffer
    nothing) — one lineage, no join, and exactly two hash exchanges:
    the (term, doc) pair aggregation and the term re-key for the
    window+final agg."""
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    plan = (
        build_inverted_index(df, max_postings=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "collect_list" in plan  # pairs are already distinct at collection
    assert "CASE WHEN" in plan     # the null-out guard sits under the agg
    assert plan.count("Exchange hashpartitioning") == 2

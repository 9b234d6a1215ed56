"""T33 anchor extraction/aggregation vs a Python-re reference, plus
protocol-subset edge cases and the top-k tie-break."""

from __future__ import annotations

import re

from warcsum_spark.operators.anchors import (
    ANCHOR_PATTERN,
    aggregate_anchor_text,
    anchor_pairs,
)


def test_pairs_match_python_re(spark):
    docs = [
        (
            "http://a.test/",
            '<a href="http://t.test/1">One</a> junk '
            "<A HREF='http://t.test/2'>  Two  </A>"
            '<a class="x" href="http://t.test/1">One again</a>',
        ),
        # nested markup: skipped entirely (documented protocol subset)
        ("http://b.test/", '<a href="/rel"><b>bold</b> tail</a>'),
        # empty anchor, href with query
        ("http://c.test/", '<a href="http://t.test/3?q=1&r=2"></a>'),
        ("http://d.test/", "no links here"),
        ("http://e.test/", None),
    ]
    df = spark.createDataFrame(docs, "url string, html string")
    got = {
        (r["url"], r["href"], r["anchor"]) for r in anchor_pairs(df).collect()
    }
    rx = re.compile(ANCHOR_PATTERN)
    expect = set()
    for url, html in docs:
        if html is None:
            continue
        for href, anchor in rx.findall(html):
            expect.add((url, href, anchor.strip()))
    assert got == expect
    # nested-markup anchors are outside the subset: no /rel row at all
    assert not any(h == "/rel" for _, h, _ in got)
    assert ("http://c.test/", "http://t.test/3?q=1&r=2", "") in got
    assert ("http://a.test/", "http://t.test/2", "Two") in got  # trim + case


def test_aggregate_topk_and_ties(spark):
    rows = (
        [("p", "t1", "alpha")] * 3
        + [("p", "t1", "beta")] * 3
        + [("p", "t1", "gamma")] * 1
        + [("q", "t2", "x")] * 2
    )
    pairs = spark.createDataFrame(rows, "url string, href string, anchor string")
    got = {
        (r["href"], r["rank"]): (r["anchor"], r["cnt"], r["n_refs"])
        for r in aggregate_anchor_text(pairs, k=2).collect()
    }
    # tie on cnt=3 broken by anchor ASC: alpha before beta; gamma cut by k=2
    assert got[("t1", 1)] == ("alpha", 3, 7)
    assert got[("t1", 2)] == ("beta", 3, 7)
    assert ("t1", 3) not in got
    assert got[("t2", 1)] == ("x", 2, 2)


def test_aggregation_keys_are_slim(spark):
    """Plan shape: the count exchange keys (href, anchor); the top-k
    window runs on aggregated counts, not the raw anchor stream."""
    pairs = spark.createDataFrame(
        [("p", "t", "a")], "url string, href string, anchor string"
    )
    plan = (
        aggregate_anchor_text(pairs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(href" in plan
    assert "row_number" in plan

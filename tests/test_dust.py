"""T45 — DUST parameter-irrelevance mining: hand-built evidence with
known supports/violations, conservative kill on one counterexample,
rewrite application, and frontier composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.dust import (
    apply_dust_rules,
    mine_param_rules,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, digest string")


def test_session_param_is_mined(spark):
    # sid never changes content; every sid-drop variant was crawled
    rows = []
    for i in range(6):
        rows.append(("a.test", f"http://a.test/p?page=1&sid={i}", "d1"))
    rows.append(("a.test", "http://a.test/p?page=1", "d1"))
    rules = mine_param_rules(_df(spark, rows), min_support=5).collect()
    assert [(r["host"], r["param"], r["supports"]) for r in rules] == [
        ("a.test", "sid", 6)
    ]


def test_one_violation_kills_the_rule(spark):
    rows = []
    for i in range(10):
        rows.append(("a.test", f"http://a.test/p?page=1&sid={i}", "d1"))
    rows.append(("a.test", "http://a.test/p?page=1", "d1"))
    # one counterexample: dropping sid=99 lands on different content
    rows.append(("a.test", "http://a.test/q?page=2&sid=99", "dX"))
    rows.append(("a.test", "http://a.test/q?page=2", "dY"))
    assert mine_param_rules(_df(spark, rows), min_support=5).count() == 0


def test_uncrawled_variant_is_no_evidence(spark):
    # page changes content but its drop-variant was never crawled:
    # neither support nor violation — excluded only by min_support
    rows = [
        ("a.test", f"http://a.test/p?page={i}", f"d{i}") for i in range(9)
    ]
    assert mine_param_rules(_df(spark, rows), min_support=1).count() == 0


def test_param_order_insensitive(spark):
    rows = [
        ("a.test", "http://a.test/p?sid=1&page=1", "d1"),
        ("a.test", "http://a.test/p?page=1&sid=2", "d1"),
        ("a.test", "http://a.test/p?page=1", "d1"),
    ]
    for i in range(4):
        rows.append(("a.test", f"http://a.test/r?page=2&sid={i + 3}", "d2"))
    rows.append(("a.test", "http://a.test/r?page=2", "d2"))
    got = mine_param_rules(_df(spark, rows), min_support=6).collect()
    assert [(r["param"], r["supports"]) for r in got] == [("sid", 6)]


def test_rules_are_host_scoped(spark):
    rows = []
    for i in range(6):
        rows.append(("a.test", f"http://a.test/p?page=1&sid={i}", "d1"))
        # on b.test, sid DOES change content
        rows.append(("b.test", f"http://b.test/p?page=1&sid={i}", f"b{i}"))
    rows.append(("a.test", "http://a.test/p?page=1", "d1"))
    rows.append(("b.test", "http://b.test/p?page=1", "b-base"))
    got = mine_param_rules(_df(spark, rows), min_support=5).collect()
    assert [(r["host"], r["param"]) for r in got] == [("a.test", "sid")]


def test_apply_rewrites_and_collapses(spark):
    rules = spark.createDataFrame(
        [("a.test", "sid", 10), ("a.test", "utm_source", 7)],
        "host string, param string, supports long",
    )
    df = spark.createDataFrame(
        [
            ("a.test", "http://a.test/p?sid=42&page=1&utm_source=x"),
            ("a.test", "http://a.test/p?page=1&sid=7"),
            ("a.test", "http://a.test/p?page=1"),
            ("b.test", "http://b.test/p?sid=42&page=1"),  # no rule host
            ("a.test", "http://a.test/plain"),
        ],
        "host string, url string",
    )
    got = [
        r["canonical_url"]
        for r in apply_dust_rules(df, rules).orderBy("url").collect()
    ]
    assert got.count("http://a.test/p?page=1") == 3
    assert "http://b.test/p?page=1&sid=42" in got  # sorted, sid kept
    assert "http://a.test/plain" in got


def test_mined_rules_shrink_the_frontier(spark):
    """End-to-end point: alias collapse before the seen-gate. 12
    distinct raw URLs, 2 real pages."""
    rows = []
    for i in range(6):
        rows.append(("a.test", f"http://a.test/p?page=1&sid={i}", "d1"))
        rows.append(("a.test", f"http://a.test/q?page=2&sid={i}", "d2"))
    rows.append(("a.test", "http://a.test/p?page=1", "d1"))
    rows.append(("a.test", "http://a.test/q?page=2", "d2"))
    df = _df(spark, rows)
    rules = mine_param_rules(df, min_support=5)
    out = apply_dust_rules(df, rules)
    assert out.select("canonical_url").distinct().count() == 2
    assert out.count() == len(rows)  # row grain preserved

"""T44 — public-suffix-list registrable domains: hand-computed
expectations for every rule kind, parse_psl, deeper rules via
max_depth, and the zero-exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.domains import (
    parse_psl,
    psl_rules_df,
    with_registrable_domain,
)

# host -> (public_suffix, registrable_domain) per the published
# algorithm over DEFAULT_RULES, worked out by hand
EXPECTED = {
    "www.example.com": ("com", "example.com"),
    "example.com": ("com", "example.com"),
    "com": ("com", None),
    "news.bbc.co.uk": ("co.uk", "bbc.co.uk"),
    "bbc.co.uk": ("co.uk", "bbc.co.uk"),
    "co.uk": ("co.uk", None),
    "uk": ("uk", None),
    # wildcard *.ck: any single label under ck is itself a suffix
    "x.y.ck": ("y.ck", "x.y.ck"),
    "y.ck": ("y.ck", None),
    "ck": ("ck", None),
    # exception !www.ck: www.ck IS registrable
    "www.ck": ("ck", "www.ck"),
    "sub.www.ck": ("ck", "www.ck"),
    # private-section rules: each subdomain is its own site
    "a.github.io": ("github.io", "a.github.io"),
    "github.io": ("github.io", None),
    "b.blogspot.com": ("blogspot.com", "b.blogspot.com"),
    "bucket.s3.amazonaws.com": ("s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    # plain amazonaws.com host: only 'com' matches
    "amazonaws.com": ("com", "amazonaws.com"),
    # unknown TLD -> default * rule
    "foo.bar.unknowntld": ("unknowntld", "bar.unknowntld"),
    "unknowntld": ("unknowntld", None),
    # case-insensitive
    "WWW.Example.COM": ("com", "example.com"),
}


@pytest.fixture(scope="module")
def rules(spark):
    return psl_rules_df(spark)


def test_every_rule_kind(spark, rules):
    df = spark.createDataFrame([(h,) for h in EXPECTED], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in with_registrable_domain(df, rules).collect()
    }
    for host, want in EXPECTED.items():
        assert got[host] == want, host


def test_parse_psl_and_deeper_rules(spark):
    body = """\
// ===BEGIN ICANN DOMAINS===
com
// a comment
jp
*.kawasaki.jp
!city.kawasaki.jp

// ===BEGIN PRIVATE DOMAINS===
s3.dualstack.ap-northeast-1.amazonaws.com
"""
    rules = psl_rules_df(spark, parse_psl(body.splitlines()))
    cases = {
        "x.y.kawasaki.jp": ("y.kawasaki.jp", "x.y.kawasaki.jp"),
        "city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
        "sub.city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
        "b.s3.dualstack.ap-northeast-1.amazonaws.com": (
            "s3.dualstack.ap-northeast-1.amazonaws.com",
            "b.s3.dualstack.ap-northeast-1.amazonaws.com",
        ),
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in with_registrable_domain(df, rules, max_depth=5).collect()
    }
    for host, want in cases.items():
        assert got[host] == want, host


def test_rule_conflicts_never_duplicate_rows(spark):
    # same suffix as both normal and wildcard base must stay 1 row/host
    rules = psl_rules_df(spark, ["ck", "*.ck", "!www.ck"])
    df = spark.createDataFrame(
        [("a.ck",), ("a.ck",), ("www.ck",)], "host string"
    )
    out = with_registrable_domain(df, rules)
    assert out.count() == 3


def test_extra_columns_carried(spark, rules):
    df = spark.createDataFrame(
        [(1, "a.example.com"), (2, "b.co.uk")], "id int, host string"
    )
    rows = with_registrable_domain(df, rules).orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["registrable_domain"] == "example.com"
    assert set(rows[0].asDict()) == {
        "id", "host", "public_suffix", "registrable_domain"
    }


def test_zero_exchange_plan(spark, rules):
    df = spark.createDataFrame([("www.example.com",)], "host string")
    plan = (
        with_registrable_domain(df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # only broadcast exchanges — host rows never shuffle
    assert "Exchange hashpartitioning" not in plan


def test_politeness_at_domain_grain(spark, rules):
    """The crawl-side point of eTLD+1: schedule_per_host keyed on
    registrable_domain treats www/news subdomains as ONE politeness
    unit."""
    from warcsum_spark.frontier.politeness import schedule_per_host

    urls = spark.createDataFrame(
        [
            ("www.bbc.co.uk", "http://www.bbc.co.uk/1", 1.0),
            ("news.bbc.co.uk", "http://news.bbc.co.uk/2", 2.0),
            ("a.github.io", "http://a.github.io/x", 1.0),
            ("b.github.io", "http://b.github.io/y", 1.0),
        ],
        "host string, url string, priority double",
    )
    dom = with_registrable_domain(urls, rules).withColumnRenamed(
        "registrable_domain", "domain"
    )
    sched = schedule_per_host(
        dom.drop("host").withColumnRenamed("domain", "host"),
        politeness=None,
        default_budget=1,
    )
    picked = {r["host"] for r in sched.collect()}
    # bbc.co.uk collapsed to one slot; each github.io site kept its own
    assert picked == {"bbc.co.uk", "a.github.io", "b.github.io"}

"""frontier/blocklist.py — domain blocklist + URL keyword gating, both
scale modes, subdomain semantics, and the plan shapes that make each
mode scale (inline = no join at all; join mode = BroadcastHashJoin,
never a nested-loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.frontier.blocklist import blocklist_gate, parent_domains

URLS = [
    ("http://ads.example.com/x", "ads.example.com"),
    ("http://example.com/y", "example.com"),
    ("http://notexample.com/z", "notexample.com"),
    ("http://deep.a.b.tracker.net/q", "deep.a.b.tracker.net"),
    ("http://clean.org/fine", "clean.org"),
    ("http://clean.org/buy-now-spam", "clean.org"),
    ("http://localhost/dev", "localhost"),
]


def _df(spark):
    return spark.createDataFrame(URLS, "url string, host string")


def _survivors(df):
    return {r["url"] for r in df.collect()}


def test_parent_domains_expansion(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "host string"
    )
    got = {
        r["host"]: r["cands"]
        for r in df.select("host", parent_domains(F.col("host")).alias("cands")).collect()
    }
    assert got["a.b.example.com"] == [
        "a.b.example.com",
        "b.example.com",
        "example.com",
    ]  # bare TLD 'com' never generated
    assert got["example.com"] == ["example.com"]
    assert got["localhost"] == ["localhost"]


def test_inline_mode_blocks_domain_and_subdomains(spark):
    out = blocklist_gate(_df(spark), ["example.com", "tracker.net"])
    assert _survivors(out) == {
        "http://notexample.com/z",  # suffix match is label-aligned, not substring
        "http://clean.org/fine",
        "http://clean.org/buy-now-spam",
        "http://localhost/dev",
    }


def test_join_mode_matches_inline_mode(spark):
    blocked = spark.createDataFrame(
        [("example.com",), ("tracker.net",)], "domain string"
    )
    inline = blocklist_gate(_df(spark), ["example.com", "tracker.net"])
    joined = blocklist_gate(_df(spark), blocked)
    assert _survivors(inline) == _survivors(joined)


def test_url_patterns(spark):
    out = blocklist_gate(_df(spark), [], url_patterns=["buy-now", "/dev$"])
    assert "http://clean.org/buy-now-spam" not in _survivors(out)
    assert "http://localhost/dev" not in _survivors(out)
    assert "http://clean.org/fine" in _survivors(out)


def test_inline_mode_is_join_free(spark):
    plan = (
        blocklist_gate(_df(spark), ["example.com"], url_patterns=["spam"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan


def test_join_mode_is_broadcast_hash_join(spark):
    blocked = spark.createDataFrame([("example.com",)], "domain string")
    plan = (
        blocklist_gate(_df(spark), blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_null_host_survives_both_modes(spark):
    """A null host matches no blocklist entry — BOTH modes must keep the
    row (inline mode's filter(~NULL) used to silently drop it)."""
    df = spark.createDataFrame(
        [("http://ok.test/x", "ok.test"), ("mailto:x@y", None)],
        "url string, host string",
    )
    inline = blocklist_gate(df, ["blocked.test"])
    joined = blocklist_gate(
        df, spark.createDataFrame([("blocked.test",)], "domain string")
    )
    assert _survivors(inline) == _survivors(joined) == {
        "http://ok.test/x",
        "mailto:x@y",
    }
    # and an empty inline blocklist drops nothing
    assert _survivors(blocklist_gate(df, [])) == {"http://ok.test/x", "mailto:x@y"}

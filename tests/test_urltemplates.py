"""T67 — URL path-template mining: segment rules vs a pure-Python
reference, rule precedence, query stripping, dedup, threshold, and
plan shape (ONE exchange)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.urltemplates import (
    SEGMENT_RULES,
    mine_url_templates,
    path_template,
)


def _ref_template(path: str) -> str:
    out = []
    for seg in path.split("/"):
        for pat, rep in SEGMENT_RULES:
            if re.match(pat + r"\Z", seg):
                out.append(rep)
                break
        else:
            out.append(seg)
    return "/".join(out)


URLS = [
    "http://a.test/post/123/view",
    "http://a.test/post/456/view",
    "http://a.test/post/789/view?page=2",
    "http://a.test/tag/news",
    "http://a.test/tag/news",  # duplicate URL
    "http://a.test/s/ab3f9c02d41e77aa",
    "http://a.test/s/0123456789abcdef",
    "http://b.test/2024/01/03/",
    "http://b.test/2024/02/14/",
    "http://b.test/about",
    "http://b.test/Very-Long-Opaque-Slug_0001/x",
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_segment_rules_match_reference(spark, urls_df):
    path = F.substring_index(
        F.regexp_replace("url", r"^[a-z]+://[^/]*", ""), "?", 1
    )
    got = {
        r.url: r.t
        for r in urls_df.select("url", path_template(path).alias("t"))
        .distinct()
        .collect()
    }
    for u in set(URLS):
        p = re.sub(r"^[a-z]+://[^/]*", "", u).split("?")[0]
        assert got[u] == _ref_template(p), u


def test_rule_precedence():
    """digits beat hex beat slug (12345678 is both all-digit and hexy)."""
    assert _ref_template("/x/12345678") == "/x/{d}"
    assert _ref_template("/x/abcdef1234") == "/x/{h}"
    assert _ref_template("/x/NotHexButLong") == "/x/{r}"
    assert _ref_template("/x/short") == "/x/short"


def test_mining(spark, urls_df):
    got = {
        (r.host, r.template): (r.n_urls, r.sample_url)
        for r in mine_url_templates(urls_df, min_urls=2).collect()
    }
    assert got[("a.test", "/post/{d}/view")] == (
        3,
        "http://a.test/post/123/view",
    )
    assert got[("a.test", "/s/{h}")][0] == 2
    assert got[("b.test", "/{d}/{d}/{d}/")][0] == 2
    # the duplicate URL deduped; singleton templates filtered
    assert ("a.test", "/tag/news") not in got
    assert ("b.test", "/about") not in got


def test_single_exchange_plan(spark, urls_df):
    plan = (
        mine_url_templates(urls_df, min_urls=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the distinct, one for the (host, template) agg —
    # and AQE may reuse; assert no MORE than these two
    assert plan.count("Exchange") <= 2

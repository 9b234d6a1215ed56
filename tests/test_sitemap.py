"""frontier/sitemap.py — protocol-subset sitemap parsing: entities,
whitespace, missing children, index files, and junk resilience."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.frontier.sitemap import parse_sitemap, sitemap_index_children

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://example.com/a?x=1&amp;y=2</loc>
    <lastmod>2026-01-15</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>  http://example.com/b  </loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://example.com/&lt;odd&gt;&apos;q&apos;</loc><priority>not-a-number</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>http://example.com/sitemap-1.xml</loc></sitemap>
  <sitemap>
    <loc>http://example.com/sitemap-2.xml</loc>
    <lastmod>2026-02-01</lastmod>
  </sitemap>
</sitemapindex>"""


def _parse(spark, body):
    df = spark.createDataFrame(
        [("http://example.com/sitemap.xml", body)], "sitemap_url string, body string"
    )
    return parse_sitemap(df).orderBy("entry_idx").collect()


def test_parse_entries(spark):
    rows = _parse(spark, SITEMAP)
    # the loc-less entry is dropped; indexes still reflect document order
    assert [r["url"] for r in rows] == [
        "http://example.com/a?x=1&y=2",  # &amp; decoded
        "http://example.com/b",          # whitespace trimmed
        "http://example.com/<odd>'q'",   # &lt;/&gt;/&apos; decoded
    ]
    assert rows[0]["lastmod"] == "2026-01-15"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None
    assert rows[2]["priority"] is None  # non-numeric → null, not a crash


def test_entry_idx_is_document_order(spark):
    rows = _parse(spark, SITEMAP)
    assert [r["entry_idx"] for r in rows] == [0, 1, 3]


def test_garbage_and_empty_bodies(spark):
    assert _parse(spark, "") == []
    assert _parse(spark, "not xml at all <url>") == []
    assert _parse(spark, "<urlset><url><loc></loc></url></urlset>") == []


def test_index_children(spark):
    df = spark.createDataFrame(
        [("http://example.com/sitemap.xml", INDEX)], "sitemap_url string, body string"
    )
    rows = sitemap_index_children(df).collect()
    assert {r["child_url"] for r in rows} == {
        "http://example.com/sitemap-1.xml",
        "http://example.com/sitemap-2.xml",
    }
    # url entries and sitemap entries don't cross-contaminate
    assert parse_sitemap(df).count() == 0


def test_parse_is_jvm_only(spark):
    df = spark.createDataFrame(
        [("s", SITEMAP)], "sitemap_url string, body string"
    )
    plan = parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan, plan

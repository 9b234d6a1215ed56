"""Property check of the BYTE-tier extraction invariant (input_hint:
byte-identical extracted text per url): the engine's Arrow-batched
``extract_text`` UDF, driven through a real Spark binary column — Arrow
binary conversion, batch slicing, null slots and all — must reproduce
``oracle.extract_text`` (the per-row spec) byte-for-byte on generated
adversarial BYTE soup: invalid UTF-8, NULs, half-open script/style
blocks, case-twisted closers, truncated entities. The SQL tier has its
own suite (test_html_property.py); this one closes the same gap for the
tier that feeds the digest pipeline."""

from __future__ import annotations

from hypothesis import strategies as st
from pyspark.sql import functions as F

from warcsum_spark.functions.html import extract_links, extract_text
from warcsum_spark.oracle import extract_text as oracle_extract_text

_BYTE_FRAGMENTS = st.sampled_from(
    [
        b"<script>", b"</script>", b"</ScRiPt >", b"<SCRIPT a='b'>",
        b"<script type=\"x\">var a = '<p>';", b"</style>", b"<style media=x>",
        b"<!--", b"-->", b"<!-- c -->", b"<!-- <script> -->",
        b"<p>", b"</p>", b"<a href='x'>", b"<a href=\"http://h.test/p?a=1\">",
        b"<a href=Z>", b"<div class=\"y\">", b"<>", b"< p >", b"<br/>",
        b"&amp;", b"&lt;", b"&gt;", b"&quot;", b"&#39;", b"&nbsp;",
        b"&amp;lt;", b"&am", b"&x;",
        b"text", b"words here", b"a<b", b"c>d", b"if (a<b && c>d) {}",
        b" ", b"\t", b"\n", b"\r\n", b"  ", b"'", b'"',
        # byte-level adversaries the SQL-tier suite cannot express
        b"\x00", b"\xff\xfe", b"\xc3", b"\xc3\xa9", b"\xe2\x82",
        b"caf\xc3\xa9", b"\xf0\x9f\x98\x80", b"\x1f\x8b\x08",
        b"<p>\xffmixed\xc3valid</p>",
    ]
)


def _byte_corpus(n: int = 300) -> list[bytes]:
    strat = st.lists(_BYTE_FRAGMENTS, min_size=0, max_size=12).map(b"".join)
    out: list[bytes] = []
    from hypothesis import HealthCheck, Phase, given, settings

    @settings(
        max_examples=n,
        phases=[Phase.generate],
        suppress_health_check=list(HealthCheck),
        deadline=None,
        derandomize=True,
    )
    @given(strat)
    def collect(s):
        out.append(s)

    collect()
    return sorted(set(out))


def test_byte_tier_matches_oracle_on_generated_soup(spark):
    corpus = _byte_corpus()
    assert len(corpus) > 100
    rows = [(i, s) for i, s in enumerate(corpus)] + [(len(corpus), None)]
    df = spark.createDataFrame(rows, "i int, html binary").repartition(8)
    got = {
        r["i"]: r["t"]
        for r in df.select("i", extract_text(F.col("html")).alias("t")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == oracle_extract_text(s), (i, s[:80])
    assert got[len(corpus)] is None  # null html → null text, never a crash


def test_byte_tier_link_extraction_document_order(spark):
    """extract_links over the same soup: href values in document order,
    bytes decoded with the same replace policy as the text tier."""
    html = (
        b"<a href='http://a.test/1'>x</a>"
        b"<p>noise</p><A HREF=\"http://b.test/2?q=1\">y"
        b"<a href=bare>unquoted-is-skipped</a>"
        b"<a name=no-href>z</a>"
        b"<a href='caf\xc3\xa9'>utf8</a>"
        b"<a href='bad\xff'>replace</a>"
    )
    df = spark.createDataFrame([(html,)], "html binary")
    (links,) = df.select(extract_links(F.col("html")).alias("l")).collect()[0]
    assert links == ["http://a.test/1", "http://b.test/2?q=1", "café", "bad�"]

"""functions/html.py — HTML→text extraction and PII redaction, checked
against an independent Python ``re`` reference (third engine besides
Spark/Java and DuckDB/RE2) on adversarial cases."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.html import (
    _DROP_PATTERNS,
    _PII_RULES,
    _SQL_ENTITIES,
    _TAG_PATTERN,
    html_to_text,
    redact_pii,
)


def ref_html_to_text(s: str) -> str:
    for pat in _DROP_PATTERNS:
        s = re.sub(pat, " ", s)
    s = re.sub(_TAG_PATTERN, " ", s)
    for ent, rep in _SQL_ENTITIES:
        s = s.replace(ent, rep)
    return re.sub(r"\s+", " ", s).strip()


def ref_redact(s: str) -> str:
    for pat, rep in _PII_RULES:
        s = re.sub(pat, rep, s)
    return s


HTML_CASES = [
    "<html><body><p>hello world</p></body></html>",
    "<SCRIPT>var x = '<p>evil</p>';</SCRIPT>visible",
    "<script src='a.js' async>if (a < b && c > d) {}</script>after",
    "<style media=\"all\">body > p { content: '<'; }</style>kept",
    "text <!-- a comment with <tags> inside --> more",
    "a &amp;lt; b &lt; c &gt; d &quot;q&quot; &#39;s&#39; e&nbsp;f &amp; g",
    "no markup at all",
    "unclosed <script>never ends...",  # drop rule can't fire; tag strip does
    "<p\nmultiline\nattr='x'>body</p>",
    "spaces\t\tand\n\nnewlines   collapse",
    "<div><div><div>deep</div></div></div>",
    "",
    "<>empty tag<>",
    "a<b>c</b>d",  # word boundary introduced by tag → 'a c d'
]

PII_CASES = [
    "mail me at first.last+tag@sub.example.co.uk today",
    "call +1 (555) 010-1234 now",
    "ssn 123-45-6789 and ip 192.168.0.1",
    "not a phone: 12-34; short: 1234567",
    "two emails a@b.io c@d.org and 10.0.0.255 done",
    "+44 20 7946 0958 rings",
    "edge 999.999.999.999 still ipv4-shaped",
    "",
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(HTML_CASES)], "i int, s string")
    rows = df.select("i", html_to_text(F.col("s")).alias("t")).collect()
    return {r["i"]: r["t"] for r in rows}


def test_html_to_text_matches_reference(extracted):
    for i, s in enumerate(HTML_CASES):
        assert extracted[i] == ref_html_to_text(s), f"case {i}: {s!r}"


def test_html_to_text_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "s string")
    assert df.select(html_to_text(F.col("s")).alias("t")).first()["t"] is None


def test_redact_pii_matches_reference(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(PII_CASES)], "i int, s string")
    rows = df.select("i", redact_pii(F.col("s")).alias("t")).collect()
    for r in rows:
        s = PII_CASES[r["i"]]
        assert r["t"] == ref_redact(s), f"case {r['i']}: {s!r}"


def test_redact_pii_full_span_and_typed_placeholders(spark):
    """Review regressions: (a) a formatted US number must be consumed
    WHOLE — a 13-char interior cap used to stop early and leak the last
    digit group ('<PHONE>-1234'); (b) dotted IPv4 must surface as <IP>,
    not be swallowed by the earlier phone rule."""
    cases = {
        "call +1 (555) 010-1234 now": "call <PHONE> now",
        "ip 192.168.0.1 up": "ip <IP> up",
        "ip 10.0.0.123 up": "ip <IP> up",
        "+44 20 7946 0958 rings": "<PHONE> rings",
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r["s"]: r["t"] for r in df.select("s", redact_pii(F.col("s")).alias("t")).collect()}
    assert got == cases


def test_redact_pii_actually_redacts(spark):
    df = spark.createDataFrame(
        [("reach a@b.io or +1 (555) 010-9999, ssn 123-45-6789, ip 10.0.0.7",)],
        "s string",
    )
    out = df.select(redact_pii(F.col("s")).alias("t")).first()["t"]
    for token in ("<EMAIL>", "<PHONE>", "<SSN>", "<IP>"):
        assert token in out, out
    assert "@" not in out and "555" not in out

"""operators/revisits.py — rehydrating deduplicated archives: the full
binary round trip (dedup-write → scan → resolve → payload bytes equal
the original), unresolvable revisits, pre-dedup multi-response
archives, and passthrough of non-revisit record types."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.revisits import resolve_revisits
from warcsum_spark.sources.revisit_writer import write_deduped_archives
from warcsum_spark.sources.warc import scan_warc_members

ROWS = [
    ("http://a.test/1", b"<html>unique one</html>"),
    ("http://a.test/2", b"<html>dup</html>"),
    ("http://b.test/3", b"<html>dup</html>"),
    ("http://c.test/4", b"<html>dup</html>"),
    ("http://c.test/5", b"<html>unique two</html>"),
]


def _members(spark, rows, schema="warc_type string, stored_algo string, "
             "stored_digest_b32 string, uri string, date string, payload binary"):
    return spark.createDataFrame(rows, schema)


def test_binary_round_trip(spark, tmp_path):
    pages = spark.createDataFrame(ROWS, "url string, body binary").repartition(1)
    write_deduped_archives(pages, str(tmp_path), prefix="t").collect()
    members = scan_warc_members(spark, str(tmp_path))
    out = resolve_revisits(members)
    rows = {r["uri"]: r for r in out.collect()}
    assert len(rows) == 5
    for uri, body in ROWS:
        assert bytes(rows[uri]["payload"]) == body, uri
        assert rows[uri]["resolved"] is True
    # the two later dup captures point at the first capture
    for dup in ("http://b.test/3", "http://c.test/4"):
        assert rows[dup]["ref_uri"] == "http://a.test/2"
        assert rows[dup]["ref_date"] is not None
    assert rows["http://a.test/2"]["ref_uri"] is None


def test_unresolvable_revisit_flagged(spark):
    members = _members(spark, [
        ("response", "sha1", "AAAA", "http://x/1", "2015-01-01", b"body-a"),
        ("revisit", "sha1", "AAAA", "http://x/2", "2015-01-02", b""),
        ("revisit", "sha1", "MISSING", "http://x/3", "2015-01-03", b""),
    ])
    rows = {r["uri"]: r for r in resolve_revisits(members).collect()}
    assert rows["http://x/2"]["resolved"] is True
    assert bytes(rows["http://x/2"]["payload"]) == b"body-a"
    assert rows["http://x/3"]["resolved"] is False
    assert bytes(rows["http://x/3"]["payload"]) == b""
    assert rows["http://x/3"]["ref_uri"] is None


def test_zero_length_original_still_resolves(spark):
    """An empty-body original (HTTP 204-style capture) is a legitimate
    resolution source: its revisit must come back resolved = true with
    the empty payload attached (round-4 ADVICE item — length(payload)>0
    used to exclude it while the oracle said resolved)."""
    members = _members(spark, [
        ("response", "sha1", "EMPTY", "http://e/1", "2015-01-01", b""),
        ("revisit", "sha1", "EMPTY", "http://e/2", "2015-01-02", b""),
    ])
    rows = {r["uri"]: r for r in resolve_revisits(members).collect()}
    assert rows["http://e/2"]["resolved"] is True
    assert rows["http://e/2"]["ref_uri"] == "http://e/1"
    assert bytes(rows["http://e/2"]["payload"]) == b""


def test_null_payload_response_not_a_source(spark):
    members = _members(spark, [
        ("response", "sha1", "NP", "http://n/1", "2015-01-01", None),
        ("revisit", "sha1", "NP", "http://n/2", "2015-01-02", b""),
    ])
    rows = {r["uri"]: r for r in resolve_revisits(members).collect()}
    assert rows["http://n/2"]["resolved"] is False


def test_pre_dedup_archive_first_capture_rule(spark):
    # two full responses share a digest: the (date, uri) minimum is the
    # original every revisit resolves to — the T57 first-capture rule
    members = _members(spark, [
        ("response", "sha1", "DD", "http://b/late", "2015-01-05", b"dup"),
        ("response", "sha1", "DD", "http://a/early", "2015-01-01", b"dup"),
        ("revisit", "sha1", "DD", "http://c/re", "2015-01-09", b""),
    ])
    rows = {r["uri"]: r for r in resolve_revisits(members).collect()}
    assert rows["http://c/re"]["ref_uri"] == "http://a/early"
    assert bytes(rows["http://c/re"]["payload"]) == b"dup"


def test_passthrough_other_types_and_null_digest(spark):
    members = _members(spark, [
        ("metadata", None, None, "http://m/1", "2015-01-01", b"{}"),
        ("conversion", "sha1", "CC", "http://w/1", "2015-01-01", b"text"),
        (None, None, None, "http://n/1", "2015-01-01", b"raw"),
    ])
    out = resolve_revisits(members)
    rows = {r["uri"]: r for r in out.collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["resolved"] is True and r["ref_uri"] is None


def test_rejects_reserved_columns(spark):
    import pytest

    members = _members(spark, []).withColumn("resolved", F.lit(True))
    with pytest.raises(ValueError):
        resolve_revisits(members)

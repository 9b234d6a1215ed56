"""T46 WAT sidecar: envelope extraction parity vs an independent
pure-Python reference (json.dumps over re-extracted fields), and sink
round-trip through the engine's own scanner."""

from __future__ import annotations

import glob
import json
import re

from pyspark.sql import functions as F

from warcsum_spark.operators.wat import wat_metadata, write_wat_archives
from warcsum_spark.sources.warc import scan_warc_members

_HREF = re.compile(r"""(?is)<a[^>]*?href[ \t\r\n]*=[ \t\r\n]*["']([^"'<> \t\r\n]+)["']""")
_TITLE = re.compile(r"(?is)<title[^>]*>([^<]*)</title")


def _pages(n=40):
    rows = []
    for i in range(n):
        title = f"<title>Page {i}</title>" if i % 4 else ""
        links = (
            f'<a href="http://h{i % 6}.test/x/{i}">a</a>'
            f"<a href='/rel/{i % 3}'>b</a>"
            if i % 5
            else ""
        )
        rows.append(
            (
                f"http://h{i % 6}.test/p/{i}",
                f"<html><head>{title}</head><body>{links}</body></html>",
            )
        )
    return rows


def _reference_envelope(url: str, html: str) -> str:
    """Independent reconstruction: Python re + json.dumps compact.
    Field order and separators must equal Spark's to_json output."""
    import hashlib

    links = _HREF.findall(html)
    m = _TITLE.search(html)
    return json.dumps(
        {
            "url": url,
            "date": "2015-01-01T00:00:00Z",
            "title": (m.group(1) if m else "").strip(),
            "n_links": len(links),
            "content_length": len(html.encode()),
            "payload_digest": hashlib.sha1(html.encode()).hexdigest(),
            "links": links,
        },
        separators=(",", ":"),
    )


def test_envelope_matches_python_reference(spark):
    rows = _pages()
    df = spark.createDataFrame(rows, "url string, html string")
    got = {
        r["url"]: r["envelope"] for r in wat_metadata(df).collect()
    }
    assert len(got) == len(rows)
    for url, html in rows:
        assert got[url] == _reference_envelope(url, html), url


def test_envelope_fields(spark):
    df = spark.createDataFrame(_pages(), "url string, html string")
    out = wat_metadata(df).collect()
    by_url = {r["url"]: r for r in out}
    r0 = by_url["http://h0.test/p/0"]  # untitled (0%4==0), linkless (0%5==0)
    assert r0["title"] == "" and r0["n_links"] == 0 and r0["links"] == []
    r1 = by_url["http://h1.test/p/1"]
    assert r1["title"] == "Page 1"
    assert r1["links"] == ["http://h1.test/x/1", "/rel/1"]
    assert r1["n_links"] == 2


def test_wat_sink_round_trip(spark, tmp_path):
    out = str(tmp_path / "wat")
    rows = _pages()
    df = spark.createDataFrame(rows, "url string, html string").repartition(4)
    manifest = write_wat_archives(df, out).collect()
    paths = sorted(glob.glob(out + "/*.warc.wat.gz"))
    assert paths == sorted(r["path"] for r in manifest)
    assert sum(r["n_records"] for r in manifest) == len(rows)

    # engine scanner re-ingests metadata members (headers + stored
    # digest; payload extraction is warcsum RESPONSE semantics — second
    # CRLFCRLF — so envelope bytes are verified via the stored sha1 and
    # the plain-Python reparse below, same contract as the WET test)
    members = scan_warc_members(spark, out, glob="*.warc.wat.gz").collect()
    assert len(members) == len(rows)
    assert all(
        r["is_warc"]
        and r["warc_type"] == "metadata"
        and r["content_type"] == "application/json"
        for r in members
    )
    by_uri = {r["uri"]: r for r in members}
    import hashlib
    from base64 import b32encode

    for url, html in rows:
        env = _reference_envelope(url, html).encode()
        b32 = b32encode(hashlib.sha1(env).digest()).decode().rstrip("=")
        assert by_uri[url]["stored_algo"] == "sha1"
        assert by_uri[url]["stored_digest_b32"] == b32

    # plain-Python reparse: envelope bytes byte-identical to the
    # independent json.dumps reference
    import gzip

    got = {}
    for p in paths:
        blob = gzip.decompress(open(p, "rb").read())
        for seg in blob.split(b"WARC/1.0"):
            if not seg:
                continue
            hdr, _, tail = seg.partition(b"\r\n\r\n")
            headers = dict(
                line.decode().split(": ", 1)
                for line in hdr.split(b"\r\n")
                if b": " in line
            )
            got[headers["WARC-Target-URI"]] = tail[
                : int(headers["Content-Length"])
            ]
    assert len(got) == len(rows)
    for url, html in rows:
        assert got[url] == _reference_envelope(url, html).encode()


def test_wat_plan_is_jvm_only(spark):
    """The envelope projection must not put Python in the plan — WAT
    generation rides the page scan for free."""
    df = spark.createDataFrame(_pages(), "url string, html string")
    plan = wat_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

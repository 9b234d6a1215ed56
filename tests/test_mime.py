"""functions/mime.py — magic-byte MIME sniffing: the full magic table,
WHATWG tag table with leading whitespace, the UTF-8-validity fallback
(octet-stream branch DuckDB can't check), and mismatch semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.functions.mime import (
    mime_mismatch,
    normalize_declared,
    sniff_mime,
)

CASES = [
    (0, b"%PDF-1.7 blah", "application/pdf"),
    (1, b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (2, b"GIF87aimg", "image/gif"),
    (3, b"GIF89aimg", "image/gif"),
    (4, b"\xff\xd8\xff\xe0jpeg", "image/jpeg"),
    (5, b"\x1f\x8b\x08\x00gz", "application/gzip"),
    (6, b"PK\x03\x04zip", "application/zip"),
    (7, b"ID3\x04tag", "audio/mpeg"),
    (8, b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    (9, b"<html><body>hi</body></html>", "text/html"),
    (10, b"  \t\r\n<!DOCTYPE html><html>", "text/html"),
    (11, b"<DIV>shouty</DIV>", "text/html"),
    (12, b"<?xml version='1.0'?><root/>", "text/xml"),
    (13, "plain utf-8 text é中".encode(), "text/plain"),
    (14, b"\xff\xfe\x00\x01 not utf8 not jpeg", "application/octet-stream"),
    (15, b"", "text/plain"),
    (16, None, None),
    # RIFF without WEBP at offset 8 is NOT webp; RIFF is valid ASCII
    (17, b"RIFF\x10\x00\x00\x00WAVEfmt ", "application/octet-stream"),
    (18, b"<p>para", "text/html"),
    (19, b"<pre>not in the tag table</pre>", "text/plain"),
    # valid UTF-8 with a WHATWG binary byte PAST the old 512-byte probe
    # but inside the spec's 1445-byte resource header → octet-stream
    # (round-4 ADVICE item: the probe window now matches the spec)
    (20, b"a" * 600 + b"\x00" + b"b" * 100, "application/octet-stream"),
    # same byte past the 1445-byte resource header: the spec never sees
    # it, but whole-payload UTF-8 validity still holds → text/plain
    (21, b"a" * 1500 + b"\x07", "text/plain"),
]


def test_sniff_table(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in CASES], "id long, payload binary"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", sniff_mime(F.col("payload")).alias("m")).collect()
    }
    for i, _, want in CASES:
        assert got[i] == want, (i, got[i], want)


def test_mismatch_semantics(spark):
    rows = [
        (1, b"%PDF-1.7 x", "text/html; charset=utf-8", True),
        (2, b"<html><body>x", "text/plain", False),  # loose text family
        (3, b"\x89PNG\r\n\x1a\nx", "image/png", False),
        (4, b"plain words", "application/pdf", True),
        (5, b"plain words", None, None),
        (6, None, "text/html", None),
    ]
    df = spark.createDataFrame(
        [(i, p, d) for i, p, d, _ in rows],
        "id long, payload binary, declared string",
    )
    staged = df.withColumn("sniffed", sniff_mime(F.col("payload")))
    got = {
        r["id"]: r["mm"]
        for r in staged.select(
            "id", mime_mismatch(F.col("sniffed"), F.col("declared")).alias("mm")
        ).collect()
    }
    for i, _, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_normalize_declared(spark):
    df = spark.createDataFrame(
        [("TEXT/HTML; charset=UTF-8",), ("  image/png  ",)], "d string"
    )
    got = [r["n"] for r in df.select(normalize_declared(F.col("d")).alias("n")).collect()]
    assert got == ["text/html", "image/png"]


def test_all_jvm_no_python(spark):
    df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
    plan = (
        df.select(sniff_mime(F.col("payload")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_with_mime_codegen_survives(spark):
    """The compose-ready helper keeps ONE sniff in the plan: no codegen
    fallback (the generated-code failure mode the mismatch API exists
    to avoid) and no Python in the plan."""
    from warcsum_spark.functions.mime import with_mime

    rows = [(i, b"%PDF-x" if i % 2 else b"<html><body>y", "text/html")
            for i in range(10)]
    df = spark.createDataFrame(rows, "id long, payload binary, declared string")
    out = with_mime(df, "payload", "declared")
    got = {r["id"]: (r["sniffed"], r["mime_mismatch"]) for r in out.collect()}
    assert got[1] == ("application/pdf", True)
    assert got[0] == ("text/html", False)

"""T63 charset sniffing + transcoding (functions/charset.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.functions.charset import (
    sniff_charset,
    sniff_sql_expr,
    transcode_html,
)

DOCS = [
    (0, "BOM utf-8 café".encode("utf-8-sig")),
    (1, b'<html><meta charset="ISO-8859-1"><body>caf\xe9</body>'),
    (2, b"<meta http-equiv=Content-Type content=\"text/html; charset=utf8\">ol\xc3\xa9",),
    (3, "plain valid utf-8 café no meta".encode()),
    (4, b"invalid utf8 caf\xe9 no meta no bom"),
    (5, b'<META CHARSET=Shift_JIS>\x83\x65\x83\x58\x83\x67'),
    (6, "BOM16".encode("utf-16-le")),
]
def _df(spark):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in DOCS], "doc_id long, body binary"
    )


def test_sniff_branches(spark):
    got = {
        r.doc_id: r.cs
        for r in _df(spark)
        .select(
            "doc_id",
            sniff_charset(F.col("body"), default="windows-1252").alias("cs"),
        )
        .collect()
    }
    assert got[0] == "utf-8"  # BOM
    assert got[1] == "iso-8859-1"  # meta, canonicalized
    assert got[2] == "utf-8"  # meta alias utf8
    assert got[3] == "utf-8"  # validity branch
    assert got[4] == "windows-1252"  # fallback
    assert got[5] == "shift_jis"  # case-insensitive meta + alias


def test_utf16le_text_gets_bom(spark):
    b = "﻿BOM16".encode("utf-16-le")  # real UTF-16LE file layout
    got = (
        spark.createDataFrame([(bytearray(b),)], "body binary")
        .select(sniff_charset(F.col("body")).alias("cs"))
        .collect()[0]
        .cs
    )
    assert got == "utf-16le"


def test_transcode_outputs(spark):
    out = {
        r.doc_id: r.text
        for r in _df(spark)
        .select("doc_id", transcode_html(F.col("body")).alias("text"))
        .collect()
    }
    assert out[0] == "BOM utf-8 café"  # BOM consumed
    assert "café" in out[1]  # latin-1 é decoded
    assert "olé" in out[2]
    assert "テスト" in out[5]  # shift_jis decoded


def test_duckdb_twin_on_bom_and_meta(spark):
    import duckdb

    rows = [d for d in DOCS if d[0] not in (3, 4)]  # validity rows excluded
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id long, body binary"
    )
    got = {
        r.doc_id: r.cs
        for r in df.select(
            "doc_id", sniff_charset(F.col("body"), validate_utf8=False).alias("cs")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, body BLOB)")
    for i, b in rows:
        con.execute("INSERT INTO t VALUES (?, ?)", [i, b])
    want = dict(
        con.sql(f"SELECT doc_id, {sniff_sql_expr('body')} AS cs FROM t").fetchall()
    )
    assert got == want


def test_jvm_only_sniff_plan(spark):
    df = _df(spark).select(sniff_charset(F.col("body")).alias("cs"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

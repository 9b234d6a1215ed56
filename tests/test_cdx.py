"""T37 — CDX(J) web-archive index: SURT urlkeys, 14-digit timestamps,
optional mime/status, globally-ordered text export, and composition
with the real .warc.gz scanner (manifest → index, the step a production
archive runs after warcsum)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.cdx import cdx_index, cdx_text_lines, surt_key


def _one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(surt_key(F.col("url")).alias("k")).collect()[0]["k"]


def test_surt_rules(spark):
    # host reversed + comma-joined, www stripped, port dropped,
    # path?query lowercased, fragment dropped, empty path -> /
    assert (
        _one(spark, "http://www.News.Example.COM:8080/A/B?Q=1#frag")
        == "com,example,news)/a/b?q=1"
    )
    assert _one(spark, "https://sub.host.test/") == "test,host,sub)/"
    assert _one(spark, "http://host.test") == "test,host)/"
    # only ONE leading www. label is stripped, and only as a whole label
    assert _one(spark, "http://www.www.x.test/p") == "test,x,www)/p"
    assert _one(spark, "http://wwwx.test/p") == "test,wwwx)/p"
    # scheme case and exotic schemes
    assert _one(spark, "HTTP://X.TEST/Upper") == "test,x)/upper"


def _captures(spark):
    rows = [
        ("http://b.test/p/2", "2024-01-02 03:04:05", "f1.warc.gz", 100, 50, "d2"),
        ("http://a.test/p/1", "2024-01-01 00:00:00", "f1.warc.gz", 0, 100, "d1"),
        ("http://a.test/p/1", "2024-02-01 00:00:00", "f2.warc.gz", 0, 90, "d3"),
    ]
    return spark.createDataFrame(
        rows, "url string, ts string, warcfile string, offset long, "
        "length long, digest string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_cdx_index_core_columns(spark):
    out = cdx_index(_captures(spark)).collect()
    by_off = {(r["filename"], r["offset"]): r for r in out}
    r = by_off[("f1.warc.gz", 0)]
    assert r["urlkey"] == "test,a)/p/1"
    assert r["timestamp"] == "20240101000000"
    assert r["url"] == "http://a.test/p/1"
    assert r["digest"] == "d1" and r["length"] == 100


def test_cdx_index_optional_mime_status(spark):
    caps = _captures(spark).withColumn("mime", F.lit("text/html")).withColumn(
        "status", F.lit(200)
    )
    out = cdx_index(caps, mime_col="mime", status_col="status")
    assert out.columns[-2:] == ["mime", "status"]
    assert out.filter("mime = 'text/html' AND status = 200").count() == 3


def test_cdx_text_lines_global_order(spark):
    lines = [r["line"] for r in cdx_text_lines(cdx_index(_captures(spark))).collect()]
    assert lines == sorted(lines)
    # same urlkey: ordered by timestamp (the two a.test captures adjacent)
    assert lines[0].startswith("test,a)/p/1 20240101000000 ")
    assert lines[1].startswith("test,a)/p/1 20240201000000 ")
    assert lines[2].startswith("test,b)/p/2 ")
    assert len(lines[0].split(" ")) == 7


def test_cdx_over_real_warc_scan(spark, warc_dir):
    """manifest → index composition over the actual scanner output:
    every response member lands exactly once, geometry preserved."""
    from warcsum_spark.functions.digests import digest_hex
    from warcsum_spark.sources.warc import scan_warc_members

    members = scan_warc_members(spark, warc_dir).filter(
        F.col("warc_type") == "response"
    )
    caps = members.select(
        F.col("uri").alias("url"),
        F.to_timestamp("date").alias("ts"),
        "warcfile",
        "offset",
        "length",
        digest_hex(F.col("payload"), "sha1").alias("digest"),
    )
    idx = cdx_index(caps)
    n = members.count()
    assert idx.count() == n > 0
    got = idx.filter(F.col("url").startswith("http://bulk1.example/")).limit(1).collect()[0]
    assert got["urlkey"].startswith("example,bulk1)/")
    assert len(got["timestamp"]) == 14 and got["timestamp"].isdigit()
    # offsets/lengths come through the index unchanged
    src = {(r["warcfile"], r["offset"], r["length"]) for r in members.select(
        "warcfile", "offset", "length").collect()}
    out = {(r["filename"], r["offset"], r["length"]) for r in idx.select(
        "filename", "offset", "length").collect()}
    assert src == out


def test_cdx_plan_is_python_free(spark):
    plan = cdx_index(_captures(spark))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

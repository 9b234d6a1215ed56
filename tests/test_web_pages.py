"""web_pages path: engine text extraction is byte-identical to the oracle
(input_hint invariant), and the S6/S7 join replacements behave."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.fixtures import write_web_pages_parquet
from warcsum_spark.functions.html import with_extracted_text
from warcsum_spark.oracle import extract_text as oracle_extract
from warcsum_spark.sources.web_pages import attach_payloads, resolve_mirror_urls


def test_extract_text_byte_identical(spark, tmp_path):
    path = str(tmp_path / "pages.parquet")
    write_web_pages_parquet(path, 400, seed=42)
    pages = spark.read.parquet(path)
    got = with_extracted_text(pages, "html", "engine_text").select(
        "url", "html", "text", "engine_text"
    )
    rows = got.collect()
    assert len(rows) == 400
    for r in rows:
        # engine matches both the stored column and an independent oracle call
        assert r["engine_text"] == r["text"], r["url"]
        assert r["engine_text"] == oracle_extract(bytes(r["html"])), r["url"]


def test_mirror_urls_broadcast_join(spark):
    manifest = spark.createDataFrame(
        [("a.warc.gz", 0), ("b.warc.gz", 10), ("c.warc.gz", 20)],
        "warcfile string, offset long",
    )
    path_index = spark.createDataFrame(
        [
            ("a.warc.gz", "http://m2/a"),
            ("a.warc.gz", "http://m1/a"),
            ("b.warc.gz", "http://m1/b"),
        ],
        "filename string, url string",
    )
    out = {r["warcfile"]: r["mirror_urls"] for r in resolve_mirror_urls(manifest, path_index).collect()}
    assert out["a.warc.gz"] == ["http://m1/a", "http://m2/a"]  # deterministic order
    assert out["b.warc.gz"] == ["http://m1/b"]
    assert out["c.warc.gz"] is None
    plan = resolve_mirror_urls(manifest, path_index)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_attach_payloads(spark, tmp_path):
    path = str(tmp_path / "pages2.parquet")
    write_web_pages_parquet(path, 50, seed=3)
    pages = spark.read.parquet(path)
    manifest = pages.select(F.col("url").alias("uri")).limit(20)
    joined = attach_payloads(manifest, pages)
    rows = joined.collect()
    assert len(rows) == 20
    assert all(r["payload"] is not None for r in rows)

"""Streaming digest stage: file-source stream produces the same manifest
rows as the batch plan over the same input, exactly once."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from warcsum_spark.fixtures import write_web_pages_parquet
from warcsum_spark.streaming.digest_stream import (
    start_digest_sink,
    stream_digest_manifest,
)


def test_stream_equals_batch(spark, tmp_path):
    indir = tmp_path / "pages_in"
    indir.mkdir()
    write_web_pages_parquet(str(indir / "part1.parquet"), 150, seed=1)
    write_web_pages_parquet(str(indir / "part2.parquet"), 150, seed=2)

    out = str(tmp_path / "manifest_out")
    ckpt = str(tmp_path / "ckpt")
    q = start_digest_sink(stream_digest_manifest(spark, str(indir)), out, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        q.processAllAvailable()
        break
    q.stop()

    got = spark.read.parquet(out)
    batch = spark.read.parquet(str(indir)).select(
        F.col("url").alias("uri"),
        F.concat(F.lit("sha1:"), F.sha1("html")).alias("digest"),
    )
    assert got.count() == 300
    got_set = {(r["uri"], r["digest"]) for r in got.select("uri", "digest").collect()}
    expect_set = {(r["uri"], r["digest"]) for r in batch.collect()}
    assert got_set == expect_set

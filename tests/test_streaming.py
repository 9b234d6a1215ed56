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


def test_stream_first_seen_across_batches(spark, tmp_path):
    """The stateful gate (applyInPandasWithState) must emit each URL once
    across micro-batches — a repeat arriving in a LATER file is filtered
    by state, which a stateless distinct cannot do."""
    import json

    from warcsum_spark.streaming.seen_stream import stream_first_seen

    indir = tmp_path / "urls_in"
    indir.mkdir()
    batch1 = [f"http://h{i % 7}.test/p/{i}" for i in range(200)]
    batch2 = batch1[100:] + [f"http://h{i % 7}.test/q/{i}" for i in range(100)]
    spark.createDataFrame([(u,) for u in batch1], "url string").coalesce(1).write.mode(
        "overwrite"
    ).json(str(indir / "b1"))

    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", "1")
        .json(str(indir / "*"))
    )
    out = stream_first_seen(stream, n_buckets=8)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame([(u,) for u in batch2], "url string").coalesce(1).write.mode(
        "overwrite"
    ).json(str(indir / "b2"))
    q.processAllAvailable()
    q.stop()

    got = [r["url"] for r in spark.sql("SELECT url FROM first_seen_t").collect()]
    assert sorted(got) == sorted(set(batch1) | set(batch2))  # no repeats
    assert len(got) == len(set(got))

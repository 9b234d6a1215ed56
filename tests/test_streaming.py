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


def test_windowed_counts_watermark_drops_late_and_withholds_open(spark, tmp_path):
    """Event-time windowed aggregation with a watermark (the brief's
    'watermarks + windowed aggs for late data'):

    * a row arriving LATER than the watermark is dropped by the stream
      (present in the batch plan over the same input — asserted both ways),
    * windows not yet passed by the watermark are withheld in append mode,
    * finalized-window counts equal the batch plan's counts.
    """
    import json

    from warcsum_spark.streaming.windowed_stats import windowed_counts

    indir = tmp_path / "ev_in"
    indir.mkdir()

    def write(name, rows):
        with open(indir / name, "w") as f:
            for ts, host in rows:
                f.write(json.dumps({"ts": f"2025-01-01T{ts}.000Z", "host": host}) + "\n")

    batch1 = [("10:00:30", "h1"), ("10:01:10", "h1"), ("10:05:00", "h2")]
    # after batch1 the watermark is max(ts) - 2min = 10:03:00
    batch2 = [
        ("10:01:30", "h1"),  # late beyond watermark (its window ended 10:02) → dropped
        ("10:06:00", "h2"),  # advances watermark to 10:04
    ]

    stream = spark.readStream.schema("ts timestamp, host string").json(
        str(indir / "*.json")
    )
    out = windowed_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .start()
    )
    write("b1.json", batch1)
    q.processAllAvailable()
    write("b2.json", batch2)
    q.processAllAvailable()
    q.stop()

    got = {
        (str(r["window_start"])[11:16], r["host"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts_t").collect()
    }
    # only the two watermark-finalized windows emitted; the late row did
    # NOT bump [10:01, 10:02); h2's windows (ends 10:06/10:07 > wm 10:04)
    # are withheld
    assert got == {("10:00", "h1"): 1, ("10:01", "h1"): 1}

    # same plan over the same rows in BATCH: every window reported and the
    # late row counted — pinning that the difference is watermark policy
    all_rows = spark.read.schema("ts timestamp, host string").json(str(indir / "*.json"))
    batch = {
        (str(r["window_start"])[11:16], r["host"]): r["n"]
        for r in windowed_counts(all_rows, window="1 minute", watermark="2 minutes").collect()
    }
    assert batch[("10:01", "h1")] == 2
    assert ("10:05", "h2") in batch and ("10:06", "h2") in batch
    for k, v in got.items():
        if k != ("10:01", "h1"):
            assert batch[k] == v


def test_stream_quality_gate_equals_batch(spark, tmp_path):
    """The round-3 gate battery (rules + model + script) is stateless
    per row, so the streaming lift must emit exactly the rows the batch
    form keeps over the same input."""
    from warcsum_spark.streaming.quality_stream import (
        gated_columns,
        stream_quality_gate,
    )

    indir = tmp_path / "qp_in"
    indir.mkdir()
    write_web_pages_parquet(str(indir / "p1.parquet"), 120, seed=3)
    write_web_pages_parquet(str(indir / "p2.parquet"), 120, seed=4)

    # fixture prose has no stopwords and '&' tokens — tune the bounds so
    # the gate discriminates on what varies here (document length)
    bounds = {
        "min_words": 33,
        "min_stopword_hits": 0,
        "min_alpha_word_frac": 0.5,
    }
    out = str(tmp_path / "qp_out")
    q = (
        stream_quality_gate(spark, str(indir), max_files_per_trigger=1, bounds=bounds)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "qp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch = gated_columns(spark.read.parquet(str(indir)), bounds=bounds)
    want = {
        (r["url"], round(r["model_score"], 6))
        for r in batch.filter(F.col("gate_keep")).collect()
    }
    got_df = spark.read.parquet(out)
    got = {
        (r["url"], round(r["model_score"], 6))
        for r in got_df.collect()
    }
    assert got == want
    assert 0 < len(got) < 240  # the gate actually discriminates


def test_stream_url_gate_equals_batch(spark, tmp_path):
    """URL admission (canonicalize → blocklist → robots) is stateless /
    stream-static, so the streaming lift must admit exactly the batch
    survivor set over the same discovered-URL firehose."""
    from warcsum_spark.streaming.url_gate import (
        gated_url_columns,
        stream_url_gate,
    )

    indir = tmp_path / "url_in"
    indir.mkdir()
    rows1 = [
        (f"HTTP://Site{i % 6}.TEST:80/p/{i}#frag", 1.0 / (i + 1))
        for i in range(60)
    ]
    rows2 = [
        (f"http://site{i % 6}.test/q/{i}?b=2&a=1", 0.5) for i in range(60)
    ] + [("not a url", 1.0), (None, 1.0)]
    for rows in (rows1, rows2):
        spark.createDataFrame(
            rows, "raw_url string, priority double"
        ).coalesce(1).write.mode("append").parquet(str(indir))
    robots = spark.createDataFrame(
        [("site1.test", [{"allow": False, "prefix": "/p/"}])],
        "host string, rules array<struct<allow boolean, prefix string>>",
    )
    kw = dict(
        blocked_domains=["site2.test"],
        block_patterns=[r"/q/1\d$"],
        robots=robots,
    )
    out = str(tmp_path / "url_out")
    q = (
        stream_url_gate(spark, str(indir), max_files_per_trigger=1, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "url_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch = gated_url_columns(
        spark.read.schema("raw_url string, priority double").parquet(str(indir)),
        **kw,
    )
    want = {(r["url"], r["host"], r["priority"]) for r in batch.collect()}
    got = {
        (r["url"], r["host"], r["priority"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # each gate actually bit: blocklist host absent, robots prefix absent,
    # pattern rows absent, canonicalization applied
    assert not any("site2.test" in u for u, _, _ in got)
    assert not any(h == "site1.test" and "/p/" in u for u, h, _ in got)
    assert not any(u.endswith(tuple(f"/q/1{d}" for d in "0123456789")) for u, _, _ in got)
    assert any(u.startswith("http://site0.test/p/") for u, _, _ in got)
    assert 0 < len(got) < 122


def test_stream_readability_equals_batch(spark, tmp_path):
    """T89's battery is a stateless row-local projection, so the
    streaming lift must score every row exactly as the batch form —
    value equality on the floats, not approx (same expressions, same
    rows, no aggregation anywhere)."""
    from warcsum_spark.streaming.readability_stream import (
        readability_columns,
        stream_readability,
    )

    indir = tmp_path / "rd_in"
    indir.mkdir()
    write_web_pages_parquet(str(indir / "p1.parquet"), 100, seed=5)
    write_web_pages_parquet(str(indir / "p2.parquet"), 100, seed=6)

    out = str(tmp_path / "rd_out")
    q = (
        stream_readability(spark, str(indir), max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "rd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    want = sorted(
        tuple(r)
        for r in readability_columns(
            spark.read.parquet(str(indir))
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == want  # exact multiset equality, floats included
    assert len(got) == 200
    # the battery actually scored something non-degenerate
    scored = [t for t in got if t[5] is not None]
    assert len(scored) > 0

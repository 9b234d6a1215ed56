"""S7 fetch stage: mapInPandas plumbing, mirror failover semantics
(warccollres.c:718–740), and the fetcher-backed link source seam."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warcsum_spark.sources.fetch import (
    HttpRangeFetcher,
    SyntheticFetcher,
    fetch_pages,
    fetching_link_source,
)


def test_fetch_pages_synthetic(spark):
    urls = [f"http://h{i}.test/p/{i}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r["url"]: r for r in fetch_pages(df, SyntheticFetcher).collect()}
    assert set(out) == set(urls)
    for u in urls:
        assert out[u]["status"] == 200
        assert bytes(out[u]["body"]) == hashlib.sha256(u.encode()).digest()


def test_http_fetcher_mirror_failover():
    """First mirror errors → second wins; all fail → status 0 + error."""

    class FakeResp:
        status = 206

        def __init__(self, body):
            self._body = body

        def read(self):
            return self._body

    calls = []

    def opener(req):
        calls.append(req.full_url)
        if "bad" in req.full_url:
            raise OSError("connection refused")
        return FakeResp(b"payload-bytes")

    f = HttpRangeFetcher(opener=opener)
    res = f.fetch_many(
        pd.Series(["http://orig.test/x"]),
        pd.Series([["http://bad.test/x", "http://good.test/x"]]),
    )
    assert calls == ["http://bad.test/x", "http://good.test/x"]
    assert res.iloc[0]["status"] == 206
    assert res.iloc[0]["mirror"] == "http://good.test/x"
    assert res.iloc[0]["body"] == b"payload-bytes"

    res2 = f.fetch_many(
        pd.Series(["http://bad.test/a"]), pd.Series([["http://bad.test/a"]])
    )
    assert res2.iloc[0]["status"] == 0
    assert res2.iloc[0]["body"] is None
    assert "connection refused" in res2.iloc[0]["error"]

    # range header is attached when a byte range is given
    status, mirror, body, err = f._fetch_one(
        "http://good.test/r", None, byte_range=(10, 99)
    )
    assert status == 206 and body == b"payload-bytes"


def test_extract_links(spark):
    html = (
        b'<html><a href="http://a.test/1">x</a>'
        b"<A HREF='http://a.test/2'>y</A>"
        b'<a class="z" href="/rel">r</a><p>no link</p></html>'
    )
    df = spark.createDataFrame([(1, html)], "i long, html binary")
    from warcsum_spark.functions.html import extract_links

    rows = df.select(extract_links(F.col("html")).alias("l")).collect()
    assert rows[0]["l"] == ["http://a.test/1", "http://a.test/2", "/rel"]


def test_frontier_round_with_fetching_link_source(spark):
    """The crawl loop runs end-to-end through the real fetch seam
    (synthetic fetcher bodies contain no links → frontier drains)."""
    from warcsum_spark.frontier.superstep import (
        frontier_round,
        init_frontier,
        scheduled_order,
    )

    seeds = spark.createDataFrame(
        [(f"http://h{i % 3}.test/s/{i}", 1.0) for i in range(9)],
        "url string, priority double",
    )
    state = init_frontier(spark, seeds)
    source = fetching_link_source(SyntheticFetcher)
    state, sched = frontier_round(spark, state, source, default_budget=2)
    order = scheduled_order(sched)
    assert len(order) == 6  # 3 hosts × budget 2
    assert {r["url"] for r in state.seen.collect()} == set(order)


def test_read_path_index_parquet_and_mirrors(spark, tmp_path):
    from warcsum_spark.sources.web_pages import read_path_index, resolve_mirror_urls

    pi = spark.createDataFrame(
        [
            ("a.warc.gz", "http://m2.test/a.warc.gz"),
            ("a.warc.gz", "http://m1.test/a.warc.gz"),
            ("b.warc.gz", "http://m1.test/b.warc.gz"),
        ],
        "filename string, url string",
    )
    path = str(tmp_path / "pi.parquet")
    pi.write.parquet(path)
    loaded = read_path_index(spark, path)
    manifest = spark.createDataFrame(
        [("a.warc.gz", 0), ("c.warc.gz", 1)], "warcfile string, offset long"
    )
    out = {r["warcfile"]: r for r in resolve_mirror_urls(manifest, loaded).collect()}
    assert out["a.warc.gz"]["mirror_urls"] == [
        "http://m1.test/a.warc.gz",
        "http://m2.test/a.warc.gz",
    ]
    assert out["c.warc.gz"]["mirror_urls"] is None

    with pytest.raises(Exception):
        read_path_index(spark, "jdbc:mysql://nowhere.test/db").collect()

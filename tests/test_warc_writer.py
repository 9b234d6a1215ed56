"""WARC sink round-trip: engine-written archives re-ingest through the
engine's own scanner AND the pure-Python oracle, byte-for-byte."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from warcsum_spark.oracle import manifest_lines, oracle_manifest
from warcsum_spark.sources.warc import scan_warc_members
from warcsum_spark.sources.warc_writer import write_warc_archives


def _pages(spark, n=60, parts=4):
    rows = [
        (
            f"http://w{i % 9}.test/p/{i}",
            (f"<html>page {i} " + "x" * (i % 257) + "</html>").encode(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, body binary").repartition(parts)


def test_round_trip_through_scanner_and_oracle(spark, tmp_path):
    out = str(tmp_path / "warcs")
    manifest = write_warc_archives(_pages(spark), out).collect()
    paths = sorted(glob.glob(out + "/*.warc.gz"))
    assert paths == sorted(r["path"] for r in manifest)
    assert sum(r["n_records"] for r in manifest) == 60

    # engine scanner re-ingests every record with payload parity
    members = scan_warc_members(spark, out)
    got = {
        r["uri"]: bytes(r["payload"])
        for r in members.filter(F.col("warc_type") == "response").collect()
    }
    assert len(got) == 60
    for i in range(60):
        uri = f"http://w{i % 9}.test/p/{i}"
        assert got[uri] == (f"<html>page {i} " + "x" * (i % 257) + "</html>").encode()

    # and the pure-Python oracle parses the same files byte-for-byte:
    # stored sha1 digests must be reusable (force=False == force=True)
    lines_reuse = sorted(manifest_lines(oracle_manifest(paths, algo="sha1", force=False)))
    lines_force = sorted(manifest_lines(oracle_manifest(paths, algo="sha1", force=True)))
    assert lines_reuse == lines_force
    digests = {l.split(" ")[3]: l.split(" ")[5] for l in lines_force}
    for i in (0, 7, 59):
        uri = f"http://w{i % 9}.test/p/{i}"
        payload = (f"<html>page {i} " + "x" * (i % 257) + "</html>").encode()
        assert digests[uri] == "sha1:" + hashlib.sha1(payload).hexdigest()


def test_null_payloads_skipped_and_empty_partitions_no_file(spark, tmp_path):
    rows = [("http://a.test/1", b"ok"), ("http://a.test/2", None)]
    df = spark.createDataFrame(rows, "url string, body binary").repartition(8)
    out = str(tmp_path / "w2")
    manifest = write_warc_archives(df, out).collect()
    assert sum(r["n_records"] for r in manifest) == 1
    # only partitions that held a non-null payload produced a file
    assert len(glob.glob(out + "/*.warc.gz")) == len(manifest)


def test_fetch_then_archive_end_to_end(spark, tmp_path):
    """Crawler loop closure: fetch over the synthetic fetcher, archive
    the 200s, rescan — digests match the fetched bodies exactly."""
    import hashlib

    from warcsum_spark.sources.fetch import SyntheticFetcher, fetch_pages

    urls = [(f"http://h{i % 5}.test/p/{i}",) for i in range(40)]
    scheduled = spark.createDataFrame(urls, "url string")
    fetched = fetch_pages(scheduled, SyntheticFetcher).filter(
        F.col("status") == 200
    )
    out = str(tmp_path / "w3")
    write_warc_archives(fetched, out).collect()
    members = scan_warc_members(spark, out)
    got = {
        r["uri"]: bytes(r["payload"])
        for r in members.filter(F.col("warc_type") == "response").collect()
    }
    assert len(got) == 40
    for (u,) in urls:
        assert got[u] == hashlib.sha256(u.encode()).digest()

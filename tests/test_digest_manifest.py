"""Stage 1 parity: Spark digest manifest == pure-Python oracle, byte-for-byte."""

from __future__ import annotations

import glob
import hashlib

import pytest

from warcsum_spark.operators.digest_manifest import digest_manifest, manifest_text
from warcsum_spark.oracle import manifest_lines, oracle_manifest
from warcsum_spark.sources.warc import scan_warc_members


def spark_manifest_lines(spark, warc_dir, **kw):
    members = scan_warc_members(spark, warc_dir)
    mf = digest_manifest(members, keep_payload=False, **kw)
    return sorted(r["line"] for r in manifest_text(mf).collect())


@pytest.mark.parametrize(
    "algo,force,skip_empty",
    [
        ("sha1", True, False),
        ("sha1", False, False),  # stored-digest reuse path (F4)
        ("sha1", True, True),  # skip-empty (P7)
        ("md5", True, False),
        ("sha256", True, False),
    ],
)
def test_manifest_matches_oracle(spark, warc_dir, algo, force, skip_empty):
    paths = sorted(glob.glob(warc_dir + "/*.warc.gz"))
    expected = sorted(
        manifest_lines(oracle_manifest(paths, algo=algo, force=force, skip_empty=skip_empty))
    )
    got = spark_manifest_lines(spark, warc_dir, algo=algo, force=force, skip_empty=skip_empty)
    assert got == expected


def test_digest_values_match_hashlib(spark, warc_dir):
    """F1: engine digests equal hashlib over the exact payload bytes."""
    members = scan_warc_members(spark, warc_dir)
    mf = digest_manifest(members, algo="sha1", keep_payload=True)
    for row in mf.limit(50).collect():
        assert row["digest"] == "sha1:" + hashlib.sha1(bytes(row["payload"])).hexdigest()


def test_filters(spark, warc_dir):
    """P4–P6: non-response / non-http members are dropped."""
    members = scan_warc_members(spark, warc_dir)
    total = members.count()
    kept = digest_manifest(members, keep_payload=False).count()
    assert kept < total
    types = {r["warc_type"] for r in members.select("warc_type").distinct().collect()}
    assert "request" in types and "metadata" in types  # fixtures cover the branches

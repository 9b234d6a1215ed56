"""Stages 3+4 parity: ext / copy_no / refersto vs oracle, including
manufactured digest collisions and both content-key modes."""

from __future__ import annotations

import glob

import pytest

from warcsum_spark.operators.collres import extended_text, resolve_collisions
from warcsum_spark.operators.stats import run_stats
from warcsum_spark.oracle import (
    extended_lines,
    oracle_extended,
    oracle_manifest,
    oracle_stats,
)
from warcsum_spark.plans.pipeline import warcsum_pipeline


def oracle_ext_lines(warc_dir, truncate_digest=None):
    rows = oracle_manifest(sorted(glob.glob(warc_dir + "/*.warc.gz")))
    if truncate_digest:
        for r in rows:
            algo, hexd = r["digest"].split(":")
            r["digest"] = f"{algo}:{hexd[:truncate_digest]}"
    return sorted(extended_lines(oracle_extended(rows))), rows


@pytest.mark.parametrize("content_key", ["payload", "fingerprint"])
def test_extended_manifest_matches_oracle(spark, warc_dir, content_key):
    expected, _ = oracle_ext_lines(warc_dir)
    df = warcsum_pipeline(spark, warc_dir, content_key=content_key)
    got = sorted(r["line"] for r in extended_text(df).collect())
    assert got == expected


def test_manufactured_collisions(spark, warc_dir):
    """Truncated digests force same-digest/different-payload clusters; the
    engine must split them into ext subgroups exactly like the oracle
    (warccollres.c:1039–1130 semantics)."""
    from pyspark.sql import functions as F

    from warcsum_spark.operators.digest_manifest import digest_manifest
    from warcsum_spark.sources.warc import scan_warc_members

    expected, _ = oracle_ext_lines(warc_dir, truncate_digest=2)
    members = scan_warc_members(spark, warc_dir)
    manifest = digest_manifest(members, keep_payload=True).withColumn(
        "digest", F.substring("digest", 1, 5 + 2)  # "sha1:" + 2 hex chars
    )
    ext = resolve_collisions(manifest)
    got = sorted(r["line"] for r in extended_text(ext).collect())
    assert got == expected
    # collisions must actually occur for this test to mean anything
    assert any(" 2 " in line.split("sha1:")[1] for line in got)


def test_stats_match_oracle(spark, warc_dir):
    paths = sorted(glob.glob(warc_dir + "/*.warc.gz"))
    exp = oracle_stats(oracle_extended(oracle_manifest(paths)))
    df = warcsum_pipeline(spark, warc_dir)
    got = run_stats(df)
    for k in ("total", "unique", "duplicates", "collisions", "distinct_digests"):
        assert got[k] == exp[k], k


def test_partitioning_invariance(spark, warc_dir):
    """Result is independent of partition count (no reliance on physical
    order — the reference's sort-order grouping is fully replaced)."""
    expected, _ = oracle_ext_lines(warc_dir)
    for n in (1, 7):
        df = warcsum_pipeline(spark, warc_dir)
        from warcsum_spark.operators.digest_manifest import digest_manifest
        from warcsum_spark.sources.warc import scan_warc_members

        members = scan_warc_members(spark, warc_dir).repartition(n)
        manifest = digest_manifest(members, keep_payload=True)
        ext = resolve_collisions(manifest, num_partitions=n)
        got = sorted(r["line"] for r in extended_text(ext).collect())
        assert got == expected

"""T77 cluster-aware leakage-safe split (operators/splits.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.sampling import split_bounds
from warcsum_spark.operators.splits import cluster_split

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ref_bucket(key: int, seed: int = 42) -> int:
    return int(
        hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:2], 16
    )


def _ref_split(key: int, weights=None, seed: int = 42) -> str:
    b = _ref_bucket(key, seed)
    for name, lo, hi in split_bounds(weights or WEIGHTS):
        if lo <= b < hi:
            return name
    raise AssertionError("bucket out of range")


def _ref_components(n_docs, pairs):
    """Union-find over the pair graph; component = min member id."""
    parent = {i: i for i in range(n_docs)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_docs)}


def _chain_pairs(n_docs):
    return [(i, i + 1) for i in range(n_docs - 1) if i % 10 < 3]


def test_matches_union_find_reference(spark):
    n = 200
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    ref_pairs = _chain_pairs(n)
    pairs = spark.createDataFrame(ref_pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: (r.split_key, r.split)
        for r in cluster_split(docs, pairs).collect()
    }
    comp = _ref_components(n, ref_pairs)
    for i in range(n):
        assert got[i] == (comp[i], _ref_split(comp[i])), i


def test_no_cluster_straddles_a_split(spark):
    """The leakage guarantee itself: both endpoints of every duplicate
    pair land in the same split (transitively, whole components)."""
    n = 500
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(_chain_pairs(n), "doc_a long, doc_b long")
    out = cluster_split(docs, pairs)
    straddle = (
        pairs.join(
            out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0


def test_isolated_docs_equal_plain_hash_split(spark):
    """With no pair evidence touching them, docs split exactly as the
    per-doc hash split would — cluster_split degrades to hash_split."""
    from warcsum_spark.functions.sampling import hash_split

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    out = {
        r.doc_id: r.split
        for r in cluster_split(docs, pairs).collect()
    }
    plain = {r.doc_id: r.split for r in hash_split(docs).collect()}
    for i in range(2, 300):
        assert out[i] == plain[i]
    assert out[1] == plain[0] == out[0]  # 1 rides 0's key


def test_precomputed_components_and_custom_weights(spark):
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    comps = spark.createDataFrame(
        [(i, i - i % 4) for i in range(100)], "node long, component long"
    )
    w = {"train": 0.5, "heldout": 0.5}
    out = {
        r.doc_id: (r.split_key, r.split)
        for r in cluster_split(docs, components=comps, weights=w).collect()
    }
    for i in range(100):
        assert out[i] == (i - i % 4, _ref_split(i - i % 4, w)), i


def test_repartition_invariance(spark):
    n = 150
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(_chain_pairs(n), "doc_a long, doc_b long")
    a = sorted(
        cluster_split(docs, pairs).select("doc_id", "split").collect()
    )
    b = sorted(
        cluster_split(docs.repartition(13), pairs.repartition(7))
        .select("doc_id", "split")
        .collect()
    )
    assert a == b


def test_requires_pairs_or_components(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="pairs= or components="):
        cluster_split(docs)

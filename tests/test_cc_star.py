"""T48 star-contraction connected components: output equivalence with
min-label propagation across graph shapes, O(log)-round behavior on
chains, and the canonical-per-cluster composition contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.clusters import (
    canonical_per_cluster,
    connected_components,
    star_components,
)


def _cc_reference(pairs):
    """Union-find ground truth, independent of both Spark operators."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the min root
    return {x: find(x) for x in parent}


GRAPHS = {
    "chain": [(i, i + 1) for i in range(100)],
    "two_cliques": [
        (a, b) for a in range(10) for b in range(a + 1, 10)
    ] + [(a, b) for a in range(20, 26) for b in range(a + 1, 26)],
    "star": [(500, x) for x in range(501, 540)],
    "self_loops_and_dups": [(1, 2), (2, 1), (3, 3), (2, 3), (1, 2)],
    "random_forest": [
        (random.Random(11).randint(0, 80), random.Random(13 * i).randint(0, 80))
        for i in range(120)
    ],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matches_minlabel_and_union_find(spark, name):
    pairs = [(a, b) for a, b in GRAPHS[name] if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        (r["node"], r["component"]) for r in star_components(df).collect()
    }
    ml = {
        (r["node"], r["component"])
        for r in connected_components(df, max_iter=200).collect()
    }
    ref = set(_cc_reference(pairs).items())
    assert got == ref
    assert got == ml


def test_long_chain_converges_in_log_rounds(spark):
    """A 200-hop chain: min-label needs ~200 rounds; star contraction
    must finish within max_iter=12 (doubling behavior)."""
    pairs = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = star_components(df, max_iter=12).collect()
    assert len(out) == 201
    assert all(r["component"] == 0 for r in out)


def test_nonconvergence_raises(spark):
    pairs = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        star_components(df, max_iter=1)


def test_composes_with_canonical_per_cluster(spark):
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21)], "doc_a long, doc_b long"
    )
    comp = star_components(pairs)
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in canonical_per_cluster(docs, comp).collect()
    }
    assert out[1] == (1, True) and out[5] == (1, False) and out[9] == (1, False)
    assert out[20] == (20, True) and out[21] == (20, False)
    assert out[7] == (7, True)  # singleton untouched by pairs

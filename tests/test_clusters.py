"""operators/clusters.py — connected components (min-label propagation)
and canonical-per-cluster selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.clusters import (
    canonical_per_cluster,
    connected_components,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter 3 → needs >1 propagation round) + pair 10-11
    got = _components(spark, [(3, 4), (1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-19: worst case for label propagation
    got = _components(spark, [(i, i + 1) for i in range(19)])
    assert got == {i: 0 for i in range(20)}


def test_edge_direction_irrelevant(spark):
    assert _components(spark, [(5, 2)]) == {2: 2, 5: 2}  # min wins either way


def test_canonical_per_cluster_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    comp = connected_components(pairs)
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in canonical_per_cluster(docs, comp).collect()
    }
    assert rows == {
        0: (0, True),
        1: (1, True),   # singleton: own cluster, canonical
        2: (2, True),
        3: (0, False),
        4: (4, True),
        5: (0, False),
    }


def test_nonconvergence_raises_instead_of_partial_labels(spark):
    # diameter 6 chain with max_iter=2: a silent return would split the
    # chain into several "clusters", each with its own canonical doc
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_canonical_unknown_policy_raises(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    comp = connected_components(
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    )
    with pytest.raises(ValueError, match="keep policy"):
        canonical_per_cluster(docs, comp, keep="longest")


def test_exactly_one_canonical_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 10) for i in range(10)] + [(i + 10, i + 20) for i in range(10)],
        "doc_a long, doc_b long",
    )
    out = canonical_per_cluster(docs, connected_components(pairs))
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        .collect()
    )
    assert all(r["n_canon"] == 1 for r in per_cluster)

"""T77 — leakage-safe cluster-aware train/val/test split.

A plain per-document hash split (functions/sampling.py) leaks through
near-duplicates: two copies of the same page land in train and test
independently, and every deduplication paper that measures it (Lee et
al. 2022 "Deduplicating Training Data Makes Language Models Better")
finds exactly this train/eval contamination inflating held-out
metrics. The guard is standard in training-data pipelines: assign the
split at the *cluster* grain — every member of a duplicate cluster
(exact or near) gets the split of its cluster key, so no cluster ever
straddles a split boundary.

``cluster_split`` composes the repo's existing pieces:

* clusters come from any pair evidence — exact-digest pairs, MinHash/
  SimHash candidate pairs (operators/dedup.py), embedding near-dup
  pairs (operators/similarity.py) — folded to (node, component) by
  ``connected_components`` (operators/clusters.py, min-id label
  propagation), or passed in precomputed;
* the split is the deterministic md5-bucket assignment of
  functions/sampling.py applied to the CLUSTER key instead of the doc
  id — still a pure function of (seed, key), engine-portable, and
  reproducible at any cluster size.

Plan shape at 10^10 docs: the component table only contains ids that
appear in a duplicate pair — a small fraction of the corpus — so the
left join attaching it is a slim (long, long) hash equi-join (AQE
broadcasts it when it fits); the bucket/CASE assignment is map-only
JVM codegen. No corpus-sized state beyond that one join.

Reference tie-in: warccollres.c's collision groups are exactly the
exact-duplicate clusters this operator consumes; the reference stops
at *naming* the copies (copy_no / refersto), while training pipelines
additionally need the copies to co-travel through the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.sampling import _bucket, split_bounds
from warcsum_spark.operators.clusters import connected_components


def cluster_split(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    components: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    seed: int = 42,
    out_col: str = "split",
    key_col: str = "split_key",
) -> DataFrame:
    """+ ``split_key`` (the cluster id the split was drawn from: the
    component's min doc id, or the doc's own id when it has no
    duplicate) and ``split`` columns.

    Pass either ``pairs`` (doc_a, doc_b duplicate evidence — folded to
    components here) or a precomputed ``components`` (node, component)
    frame; passing both uses ``components`` and ignores ``pairs``.
    Every doc in one component gets one split, by construction: the
    bucket is a function of the shared key.
    """
    if components is None:
        if pairs is None:
            raise ValueError("cluster_split needs pairs= or components=")
        components = connected_components(pairs, a_col=a_col, b_col=b_col)
    comp = components.select(
        F.col("node").alias("_cs_node"),
        F.col("component").alias("_cs_component"),
    )
    joined = docs.join(
        comp, docs[id_col] == comp["_cs_node"], "left"
    ).drop("_cs_node")
    key = F.coalesce(F.col("_cs_component"), F.col(id_col))

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = _bucket(key, seed)
    bounds = split_bounds(weights)
    expr = None
    for name, _lo, hi in bounds[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(bounds[-1][0]) if expr is None else expr.otherwise(
        bounds[-1][0]
    )
    return (
        joined.withColumn(key_col, key)
        .withColumn(out_col, expr)
        .drop("_cs_component")
    )

"""Near-duplicate CLUSTERS from pair lists: connected components +
canonical-document selection — the decision stage of a dedup pipeline
(pairs from MinHash-LSH / SimHash / n-gram Jaccard say "these two are
dups"; this stage says "keep THIS one, drop those").

Connected components run as iterative min-label propagation on the
DataFrame API (Spark has no built-in CC; GraphFrames is an external
package). Each round every node takes the minimum label among itself and
its neighbors; rounds repeat until no label changes. Converges in
O(diameter) rounds — near-dup clusters are small and dense (diameter
rarely > 3), so 3–5 rounds in practice; ``max_iter`` bounds pathological
chains. Each round is ONE join + ONE groupBy on (node) and the frame is
``localCheckpoint``ed to truncate lineage (same idiom as the frontier
superstep — an O(rounds) plan would otherwise re-execute every prior
join per action). At 10^10 edges the same plan holds: both shuffles key
on node id, and the label frame carries exactly 2 longs per node.
Doubling/"alternating star" variants (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) cut rounds to
O(log diameter) at the cost of edge rewrites; min-label is the right
trade while diameters stay small.

The driver oracle computes the same components with a recursive CTE
(min reachable id per node) — see __spark_entry__.ORACLE_DEDUP_CLUSTERS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) — component = min node id reachable through the
    undirected pair graph. Nodes are every id appearing in ``pairs``;
    callers union isolated ids afterwards if they need singletons.

    Raises ``RuntimeError`` if labels have not converged after
    ``max_iter`` rounds (a component of diameter > max_iter) — a
    partially-propagated result would silently split one true cluster
    into several, each with its own "canonical" doc. Label propagation
    needs one round per hop, so raise ``max_iter`` for pathological
    chain graphs (or switch to a star-contraction variant)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(edges, labels):
        return _cc_loop(edges, labels, max_iter)


def _cc_loop(edges, labels, max_iter):
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint(eager=False)
        # one job: the filtered count materializes the lazy checkpoint
        # (persisting every partition of the same RDD for the next
        # round) and answers the convergence test (hopdist.py discipline)
        changed = new_labels.filter(F.col("_changed")).count()
        # NOTE: localCheckpoint blocks are NOT freed by Dataset.unpersist
        # (that only clears CacheManager entries); they are reclaimed by
        # the ContextCleaner once the previous frame's RDD is
        # garbage-collected — dropping the reference is the release.
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph has a component with diameter > max_iter); raise max_iter"
    )


def _undirect(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, deduped."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Kiveris et al. SoCC'14 large-star: per node u (over BOTH edge
    directions), m = min(N(u) ∪ {u}); re-attach every strictly-larger
    neighbor to m. One exchange keyed on u over (long, long) rows."""
    bidir = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    grouped = bidir.groupBy("u").agg(
        F.min("v").alias("nbr_min"), F.collect_list("v").alias("nbrs")
    )
    m = F.least(F.col("u"), F.col("nbr_min"))
    return _undirect(
        grouped.select(
            m.alias("m"), F.explode("nbrs").alias("nbr"), F.col("u")
        )
        .filter(F.col("nbr") > F.col("u"))
        .select(F.col("nbr").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient each edge larger→smaller, per node u with
    neighbors v < u let m = min(N(u)); attach u and every non-min
    neighbor to m. One exchange keyed on u."""
    oriented = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    grouped = oriented.groupBy("u").agg(
        F.min("v").alias("m"), F.collect_list("v").alias("nbrs")
    )
    re_nbrs = grouped.select(
        F.explode("nbrs").alias("u"), F.col("m").alias("v")
    ).filter(F.col("u") != F.col("v"))
    re_self = grouped.select("u", F.col("m").alias("v"))
    return _undirect(re_nbrs.unionByName(re_self))


def star_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) by ALTERNATING STAR CONTRACTION (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the O(log n)-round alternative to ``connected_components``'s
    min-label propagation, which needs one round per HOP and therefore
    O(diameter) rounds. Same output contract (component = min node id;
    nodes = every id appearing in ``pairs``), interchangeable with
    ``canonical_per_cluster``.

    When to use which: near-dup clusters are small and dense (diameter
    ≤ 3 — min-label wins on constant factors); link graphs, host
    graphs, and alias-collapsed URL spaces have long chains where
    min-label's O(diameter) rounds are the scale killer and this
    operator's doubling behavior is the textbook fix. Each round is
    two single-exchange group-bys over slim (long, long) edges; the
    per-node neighbor list a star step collects is bounded by that
    node's CURRENT degree, and large-star re-attaches high-degree
    nodes' neighbors to the minimum, so hot nodes shed degree as the
    contraction proceeds. ``localCheckpoint`` truncates lineage per
    round (frontier-superstep idiom). Raises after ``max_iter``
    non-converged rounds like its sibling."""
    edges = _undirect(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    # NOTE: star-contraction rounds do EDGE-sized work (two windowed
    # re-attachment passes over the full edge set), not state-sized —
    # pinning loop shuffle partitions to the anchor count was measured
    # 4x SLOWER here (cc_star_chains 0.6 -> 2.6 s); AQE keeps the
    # per-round plans right, so no loop_plan_conf on this loop.
    return _star_loop(edges, nodes, n_edges, max_iter)


def _star_loop(edges, nodes, n_edges, max_iter):
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # count() materializes the lazy checkpoint (one job, hopdist.py
        # discipline); the previous round's count is carried in a local
        # instead of re-running count() on the old frame every round
        n_new = new_edges.count()
        same = (
            n_new == n_edges
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        edges = new_edges
        n_edges = n_new
        if same:
            # converged: edges form stars (child, root) with root = min
            roots = edges.select(
                F.col("v").alias("node"), F.col("u").alias("_root")
            )
            return nodes.join(roots, "node", "left").select(
                "node",
                F.coalesce(F.col("_root"), F.col("node")).alias("component"),
            )
    raise RuntimeError(
        f"star_components did not converge in {max_iter} rounds; "
        "raise max_iter"
    )


def canonical_per_cluster(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min_id",
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) over ALL docs: docs absent from
    ``components`` are their own singleton cluster. ``keep='min_id'``
    keeps the lowest id per cluster (deterministic; warcsum's first-copy
    rule — warcsumproc:30–40 keeps the first record of each digest
    cluster, which under sorted ids IS the minimum)."""
    if keep != "min_id":
        raise ValueError(f"unknown keep policy: {keep}")
    joined = docs.select(F.col(id_col).alias("doc_id")).join(
        components.select(F.col("node").alias("doc_id"), "component"),
        "doc_id",
        "left",
    )
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    return joined.select(
        "doc_id",
        cluster.alias("cluster_id"),
        (F.col("doc_id") == cluster).alias("is_canonical"),
    )

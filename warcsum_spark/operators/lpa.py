"""T61 — synchronous label propagation (LPA) community detection over
the link/host graph (Raghavan et al. 2007, the deterministic
synchronous variant). Connected components (T3/T48) answer "what is
reachable"; LPA answers "what clusters densely" — mirror farms, link
rings, and template families form tight communities long before they
merge into one giant connected component. The standard crawl-QA use is
on the HOST graph (operators/hostgraph.py edges feed straight in).

Determinism: classic LPA is order-dependent (async updates, random
tie-breaks) and would never be engine-reproducible. This is the
synchronous variant with a total tie order: every round, each node
adopts the most frequent label among its neighbors, ties broken by the
SMALLEST label, all nodes updating simultaneously from the previous
round's labels; isolated nodes keep their own. Fixed round count (LPA
converges in a handful of rounds; oscillation between two labelings —
possible on bipartite structures under synchronous update — is bounded
by the round budget, and determinism is what the gate certifies).

Spark shape (pagerank.py idiom): per round, ONE join of the bidirected
edge list with the label frame + a (node, label) count aggregation + a
per-node argmax window; labels localCheckpoint per round (lineage cut).
Shuffles carry (long, long) or (long, long, long) rows only — the
graph's payload columns never enter the loop. At 10^10 edges each round
is two hash exchanges on node id; the edge list is built once and
reused, so a production run pre-partitions it and every round reuses
the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_interval: int = 3,
) -> DataFrame:
    """(node, label) after ``iters`` synchronous LPA rounds; labels
    start as node ids, so a label is always the id of some member and
    communities are comparable across engines. Edges are treated as
    undirected; duplicates and self-loops are dropped.

    Lineage is cut (eager localCheckpoint) every ``checkpoint_interval``
    rounds rather than every round: each eager cut is a full job, and a
    few rounds of join/agg lineage is well within Catalyst's comfort —
    per-round cuts just multiply fixed job overhead by ``iters``."""
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    bidir = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = bidir.select(F.col("a").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )
    w = Window.partitionBy("node").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(bidir, nodes):
        return _lpa_loop(bidir, labels, w, iters, checkpoint_interval)


def _lpa_loop(bidir, labels, w, iters, checkpoint_interval):
    for i in range(iters):
        votes = (
            bidir.join(labels, bidir.b == labels.node)
            .select(F.col("a").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        winner = (
            votes.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        # labels' node set is invariant (every node keeps a row each
        # round), so one left join against the previous labels suffices
        # — no separate rejoin through `nodes`.
        labels = labels.join(winner, "node", "left").select(
            "node", F.coalesce("_new", "label").alias("label")
        )
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def lpa_oracle_sql(edges_cte: str, iters: int = 5) -> str:
    """The same synchronous rounds unrolled as MATERIALIZED DuckDB CTEs
    (hits.py discipline — materialization stops exponential CTE
    re-inlining). ``edges_cte`` yields (src, dst)."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b "
        f"FROM ({edges_cte}) WHERE src <> dst)",
        "bidir AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)",
        "nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM bidir)",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"l{i}", f"l{i + 1}"
        parts.append(
            f"v{i + 1} AS MATERIALIZED (SELECT bidir.a AS node, {prev}.label, "
            f"count(*) AS n FROM bidir JOIN {prev} ON {prev}.node = bidir.b "
            f"GROUP BY bidir.a, {prev}.label)"
        )
        parts.append(
            f"w{i + 1} AS MATERIALIZED (SELECT node, label AS new_label FROM ("
            f"SELECT node, label, row_number() OVER (PARTITION BY node "
            f"ORDER BY n DESC, label ASC) AS r FROM v{i + 1}) WHERE r = 1)"
        )
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(w{i + 1}.new_label, {prev}.label) AS label "
            f"FROM nodes LEFT JOIN w{i + 1} ON w{i + 1}.node = nodes.node "
            f"JOIN {prev} ON {prev}.node = nodes.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, label FROM l{iters}"

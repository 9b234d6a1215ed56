"""T113 — Katz centrality over the crawl link graph (Katz 1953,
"A new status index derived from sociometric analysis").

Where PageRank (T32) divides a page's vote by its out-degree, Katz
counts *attenuated in-walks of every length*: x = Σ_{k≥0} α^k (Aᵀ)^k·β
— a page is central if many short walk chains end at it, regardless of
how promiscuous the linkers are. In a crawl frontier this is the
complementary priority signal to PageRank: link farms that split their
vote (and thus dilute PageRank flow) still pile up raw walk counts, so
a high-Katz/low-PageRank page is a fan-in anomaly worth budget-gating
(T73) before fetch. Dangling pages participate naturally — every node
holds the β base term, so the not-yet-fetched leaves a frontier is
full of need no special mass-redistribution branch.

Spark-first iterative shape (the T32 discipline unchanged): the score
recurrence x ← β + α·Aᵀx is ONE edge join + ONE dst-keyed aggregation
per round, with the score frame ``localCheckpoint``ed so the lazy
chain doesn't re-expand O(3^iters) subtrees. Duplicate edges collapse
once up front (classic unweighted formulation). Per-round rounding to
``round_scale`` decimals pins the float trajectory bit-for-bit across
engines — the DuckDB oracle unrolls the identical iterations as
chained CTEs and matches exactly, not approximately.

At 10^10 edges: the one per-iteration shuffle hash-partitions on node
id — the same key every round, so a production run pre-partitions the
edge list once and every round reuses the layout; score state is one
double per node. Truncation at ``iters`` rounds is the standard
practice when α·λ_max < 1 can't be certified up front (walks longer
than ``iters`` are attenuated by α^iters anyway).

Reference semantics note: warcsum itself has no graph stage; this is a
§2.12 frontier-priority extension (SURVEY §2.12), sibling to T32/T79.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    round_scale: int = 10,
) -> DataFrame:
    """(node, katz) after ``iters`` rounds of x ← β + α·Aᵀx from the
    x = β start — i.e. the Neumann series Σ_{k=0..iters} α^k (Aᵀ)^k·β
    truncated at walk length ``iters``. Nodes are every id appearing
    as src or dst; duplicate edges collapse (unweighted adjacency)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scores = nodes.select(
        "node", F.round(F.lit(float(beta)), round_scale).alias("katz")
    ).localCheckpoint(eager=True)

    # plain per-round planning in the small-state regime (no-op at
    # production scale) + lazy per-round checkpoints — the
    # pagerank.py discipline
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(e, nodes):
        for _ in range(iters):
            walk_in = (
                e.join(scores, e.src == scores.node)
                .select(F.col("dst").alias("node"), F.col("katz").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("_in"))
            )
            scores = (
                nodes.join(walk_in, "node", "left")
                .select(
                    "node",
                    F.round(
                        F.lit(float(beta))
                        + float(alpha) * F.coalesce(F.col("_in"), F.lit(0.0)),
                        round_scale,
                    ).alias("katz"),
                )
                .localCheckpoint(eager=False)
            )
    return scores


def katz_oracle_sql(
    edges_cte: str,
    alpha: float = 0.1,
    beta: float = 1.0,
    iters: int = 4,
    round_scale: int = 10,
    final_scale: int = 8,
) -> str:
    """The same computation as chained CTEs for DuckDB — one
    (walk-in, score) pair per unrolled iteration, identical per-round
    rounding, so the oracle is exact (T32 oracle discipline).
    ``edges_cte`` is a SELECT yielding (src, dst)."""
    a, b = float(alpha), float(beta)
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"x0 AS (SELECT node, round({b!r}::DOUBLE, {round_scale}) AS katz "
        "FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"x{i}", f"x{i + 1}"
        parts.append(
            f"w{i + 1} AS (SELECT e.dst AS node, sum({prev}.katz) AS w "
            f"FROM e JOIN {prev} ON {prev}.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.node, "
            f"round({b!r} + {a!r} * coalesce(w{i + 1}.w, 0.0), {round_scale}) "
            f"AS katz FROM nodes LEFT JOIN w{i + 1} "
            f"ON w{i + 1}.node = nodes.node)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, round(katz, {final_scale}) AS katz FROM x{iters}"
    )

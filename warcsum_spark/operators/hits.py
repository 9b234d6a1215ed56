"""T55 — HITS hubs & authorities over the crawl link graph (Kleinberg
JACM 1999). PageRank (operators/pagerank.py) scores global importance;
HITS separates DIRECTORY pages (hubs — pages whose outlinks point at
good content: seed lists, category indexes) from CONTENT pages
(authorities — pages good hubs point at). A frontier that wants
coverage fast crawls high-hub pages first (their outlinks fan out to
many authorities); a ranking pipeline wants the authority side. The two
scores are mutually recursive, so this is the same iterative shape as
PageRank, not a window.

Spark-first iterative shape (pagerank.py idiom): each half-step is ONE
edge-keyed join + ONE node-keyed aggregation; the score frame is
``localCheckpoint``ed per round (a lazy chain re-expands the prior
lineage everywhere it is consumed — O(k^iters) subtrees); the L2
normalizer is a one-row aggregate joined back via broadcast, never a
driver collect. Per-iteration shuffles carry (node, double) rows only.

Engine-portability: after every normalization the scores are rounded to
``round_scale`` decimals, pinning the float trajectory so the driver's
DuckDB oracle — the same iterations unrolled as chained CTEs — matches
EXACTLY, not approximately (pagerank.py:20–24 discipline; without it,
engine summation orders drift in the 13th digit and the sqrt/divide
amplifies the drift across rounds).

At 10^10 edges: both half-step shuffles are hash exchanges on node id —
the same key every round, so a production run pre-partitions the edge
list once and reuses the layout; score state is 2 doubles per node and
the normalizer is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    round_scale: int = 10,
) -> DataFrame:
    """(node, hub, authority) after ``iters`` mutual-recursion rounds
    from the all-ones start, L2-normalized after every half-step.
    Nodes are every id appearing as src or dst; duplicate edges are
    collapsed (multiplicity does not multiply score flow — the classic
    formulation). Within a round the authority update runs first and
    the hub update consumes the NEW authorities (Kleinberg's I-then-O
    ordering)."""
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
    hub = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint(eager=True)
    auth = None
    # plain per-half-step planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(e, nodes):
        for _ in range(iters):
            auth = _half_step(nodes, e, hub, "hub", "src", "dst", "authority", round_scale)
            hub = _half_step(nodes, e, auth, "authority", "dst", "src", "hub", round_scale)
    return nodes.join(hub, "node").join(auth, "node").select("node", "hub", "authority")


def _half_step(
    nodes: DataFrame,
    e: DataFrame,
    scores: DataFrame,
    score_col: str,
    from_col: str,
    to_col: str,
    out_col: str,
    round_scale: int,
) -> DataFrame:
    """One HITS half-step: raw(to) = Σ score(from) over edges, then L2
    normalize and round. Nodes with no incident edge on the ``to`` side
    score 0. Returns a checkpointed (node, out_col) frame."""
    raw = (
        e.join(scores, e[from_col] == scores.node)
        .select(F.col(to_col).alias("node"), F.col(score_col).alias("_s"))
        .groupBy("node")
        .agg(F.sum("_s").alias("_raw"))
    )
    with_raw = nodes.join(raw, "node", "left").select(
        "node", F.coalesce(F.col("_raw"), F.lit(0.0)).alias("_raw")
    )
    norm = with_raw.agg(
        F.greatest(F.sqrt(F.sum(F.col("_raw") * F.col("_raw"))), F.lit(1e-12)).alias(
            "_norm"
        )
    )
    return (
        with_raw.crossJoin(F.broadcast(norm))
        .select(
            "node",
            F.round(F.col("_raw") / F.col("_norm"), round_scale).alias(out_col),
        )
        # LAZY: materialization merges into the next half-step's stages
        .localCheckpoint(eager=False)
    )


def hits_oracle_sql(
    edges_cte: str,
    iters: int = 4,
    round_scale: int = 10,
    final_scale: int = 8,
) -> str:
    """The same computation as chained CTEs for DuckDB — one
    (raw, normalized) pair per half-step per unrolled iteration with
    identical rounding, so the oracle is exact and structurally blind
    to the Spark join/broadcast plan. ``edges_cte`` is a SELECT
    yielding (src, dst)."""
    # Every CTE is MATERIALIZED: the chain is deep (two half-steps per
    # iteration) and each level is referenced 2–3 times — inlined, DuckDB
    # re-expands the whole prior chain per reference, which is
    # exponential in the iteration count (the SQL mirror of the lineage
    # blowup localCheckpoint prevents on the Spark side).
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS s FROM nodes)",
    ]
    for i in range(iters):
        prev_h, cur_a, cur_h = f"h{i}", f"a{i + 1}", f"h{i + 1}"
        for cur, src_scores, edge_from, edge_to in (
            (cur_a, prev_h, "src", "dst"),
            (cur_h, cur_a, "dst", "src"),
        ):
            parts.append(
                f"{cur}_raw AS MATERIALIZED (SELECT nodes.node, "
                f"coalesce(r.raw, 0.0) AS raw "
                f"FROM nodes LEFT JOIN (SELECT e.{edge_to} AS node, "
                f"sum({src_scores}.s) AS raw "
                f"FROM e JOIN {src_scores} ON {src_scores}.node = e.{edge_from} "
                f"GROUP BY e.{edge_to}) r ON r.node = nodes.node)"
            )
            parts.append(
                f"{cur} AS MATERIALIZED (SELECT node, round(raw / n.nrm, "
                f"{round_scale}) AS s FROM {cur}_raw, "
                f"(SELECT greatest(sqrt(sum(raw * raw)), 1e-12) AS nrm "
                f"FROM {cur}_raw) n)"
            )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT h.node, round(h.s, {final_scale}) AS hub, "
        f"round(a.s, {final_scale}) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )

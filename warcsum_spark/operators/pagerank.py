"""T32 — PageRank over the crawl link graph, the classic priority
signal a production frontier feeds into its per-host queues (the
north-star scheduler ranks by priority; this computes that priority
from link structure instead of taking it on faith from the seed list).

Spark-first iterative shape (same idiom as clusters.py / the frontier
superstep): each iteration is ONE edge-keyed join + ONE dst-keyed
aggregation, with the rank frame ``localCheckpoint``ed per round —
a lazy chain would re-expand the whole prior lineage at every of the
three places the rank frame is consumed (contributions, dangling mass,
rank base), i.e. O(3^iters) subtrees. The degree-weighted edge list is
built once and checkpointed; per-iteration shuffles key on node ids
and carry (node, double) rows only. Dangling-node mass (pages with no
outlinks — crawl frontiers are FULL of these: every not-yet-fetched
leaf) is redistributed uniformly via a one-row broadcast join, never a
driver collect.

Engine-portability: ranks are rounded to ``round_scale`` decimals at
the END of every iteration, which pins the float trajectory bit-for-bit
across engines — the driver's DuckDB oracle unrolls the same iterations
as chained CTEs (one pair per round) and must match exactly, not
approximately. (Without per-round rounding, different summation orders
drift in the 13th digit and diverge after a few damping multiplies.)

At 10^10 edges: both per-iteration shuffles are hash exchanges on node
id — the same key every round, so a production run pre-partitions the
edge list once and every iteration reuses the layout; rank state is
2 doubles per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    round_scale: int = 10,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations from the uniform
    start. Nodes are every id appearing as src or dst; duplicate edges
    are collapsed (link multiplicity does not multiply rank flow —
    match the classic formulation)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    e_w = e.join(deg, "src").localCheckpoint(eager=True)  # (src, dst, _deg)
    # node table with the FIXED dangling flag (no out-edges): computing it
    # once replaces the per-round ranks⋈deg anti-join with a filter over
    # the already-materialized ranks — one join + two exchanges fewer per
    # iteration, same dangling set by construction
    nd = nodes.join(
        deg.select(F.col("src").alias("node"), F.lit(True).alias("_has_out")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("_has_out", F.lit(False)).alias("_has_out")
    ).localCheckpoint(eager=True)
    n1 = nd.agg(F.count("*").alias("_n"))  # one row, broadcast below

    ranks = nd.crossJoin(F.broadcast(n1)).select(
        "node",
        "_has_out",
        F.round(F.lit(1.0) / F.col("_n"), round_scale).alias("rank"),
    ).localCheckpoint(eager=True)

    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf; per-round
    # checkpoints are LAZY (plan truncation happens at build either
    # way; materialization merges into the next round's stages)
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(e_w, nd):
        for _ in range(iters):
            contribs = (
                e_w.join(ranks, e_w.src == ranks.node)
                .select(F.col("dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("_contrib"))
            )
            dangling = ranks.filter(~F.col("_has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            ranks = (
                nd.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .crossJoin(F.broadcast(n1))
                .select(
                    "node",
                    "_has_out",
                    F.round(
                        (1.0 - damping) / F.col("_n")
                        + damping
                        * (
                            F.coalesce(F.col("_contrib"), F.lit(0.0))
                            + F.col("_dm") / F.col("_n")
                        ),
                        round_scale,
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks.select("node", "rank")


def pagerank_oracle_sql(
    edges_cte: str,
    damping: float = 0.85,
    iters: int = 4,
    round_scale: int = 10,
    final_scale: int = 8,
) -> str:
    """The same computation as chained CTEs for DuckDB — one
    (contrib, rank) pair per unrolled iteration, identical per-round
    rounding, so the oracle is exact. ``edges_cte`` is a SELECT
    yielding (src, dst)."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, round(1.0 / n.n, {round_scale}) AS rank FROM nodes, n)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"c{i + 1} AS (SELECT e.dst AS node, sum({prev}.rank / deg.deg) AS contrib "
            f"FROM e JOIN deg USING (src) JOIN {prev} ON {prev}.node = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"d{i + 1} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {prev} "
            f"WHERE node NOT IN (SELECT src FROM deg))"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.node, "
            f"round((1.0 - {d}) / n.n + {d} * (coalesce(c{i + 1}.contrib, 0.0) "
            f"+ d{i + 1}.dm / n.n), {round_scale}) AS rank "
            f"FROM nodes LEFT JOIN c{i + 1} ON c{i + 1}.node = nodes.node, "
            f"d{i + 1}, n)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, round(rank, {final_scale}) AS rank FROM r{iters}"
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    round_scale: int = 10,
) -> DataFrame:
    """T79 — TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004):
    personalized PageRank whose teleport vector is uniform over a
    trusted SEED SET instead of all nodes — trust flows out from
    hand-vetted pages, and spam neighborhoods that organic link mass
    never reaches end up with rank ≈ 0. The standard web-spam demotion
    signal beside raw PageRank (a page with high PageRank but low
    TrustRank is the classic link-farm signature).

    Differences from ``pagerank`` above, per the paper: the start
    vector, the (1−d) teleport term, and the dangling-node mass all
    concentrate on the seeds (mass returns to the trusted set, not
    uniformly). Seeds outside the graph's node set are ignored; the
    effective seed count normalizes the teleport. Everything else —
    per-round rounding for engine-exactness, one edge join + one
    dst-keyed aggregation per iteration, localCheckpoint lineage cuts,
    (node, double) shuffle rows — is the T32 discipline unchanged. The
    seed table is dimension-sized by definition (hand-vetted) and is
    broadcast; at 10^10 edges the per-iteration cost is identical to
    pagerank's.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # seed flag + fixed dangling flag in ONE node table (see pagerank:
    # the flag replaces the per-round anti-join with a filter)
    marked = nodes.join(
        F.broadcast(s.withColumn("_is_seed", F.lit(True))), "node", "left"
    ).join(
        deg.select(F.col("src").alias("node"), F.lit(True).alias("_has_out")),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("_is_seed"), F.lit(False)).alias("_is_seed"),
        F.coalesce(F.col("_has_out"), F.lit(False)).alias("_has_out"),
    ).localCheckpoint(eager=True)
    ns1 = marked.agg(
        F.sum(F.col("_is_seed").cast("long")).alias("_ns")
    )  # one row, broadcast below
    e_w = e.join(deg, "src").localCheckpoint(eager=True)

    def _teleport():
        return F.when(
            F.col("_is_seed"), F.lit(1.0) / F.col("_ns")
        ).otherwise(F.lit(0.0))

    ranks = marked.crossJoin(F.broadcast(ns1)).select(
        "node",
        "_is_seed",
        "_has_out",
        F.round(_teleport(), round_scale).alias("rank"),
    ).localCheckpoint(eager=True)

    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf; LAZY per-round
    # checkpoints (see pagerank above)
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(e_w, marked):
        for _ in range(iters):
            contribs = (
                e_w.join(ranks, e_w.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    (F.col("rank") / F.col("_deg")).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("_contrib"))
            )
            dangling = ranks.filter(~F.col("_has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            ranks = (
                marked.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .crossJoin(F.broadcast(ns1))
                .select(
                    "node",
                    "_is_seed",
                    "_has_out",
                    F.round(
                        (1.0 - damping) * _teleport()
                        + damping
                        * (
                            F.coalesce(F.col("_contrib"), F.lit(0.0))
                            + F.col("_dm") * _teleport()
                        ),
                        round_scale,
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks.select("node", "rank")


def trustrank_oracle_sql(
    edges_cte: str,
    seeds_cte: str,
    damping: float = 0.85,
    iters: int = 4,
    round_scale: int = 10,
    final_scale: int = 8,
) -> str:
    """The identical iteration unrolled as chained CTEs (T32 oracle
    discipline). ``seeds_cte`` yields (node); seeds outside the graph
    are dropped before normalization, exactly as the engine does."""
    d = damping
    t = "CASE WHEN m.is_seed THEN 1.0 / ns.ns ELSE 0.0 END"
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"s AS (SELECT DISTINCT node FROM ({seeds_cte}) "
        "WHERE node IN (SELECT node FROM nodes))",
        "m AS (SELECT nodes.node, nodes.node IN (SELECT node FROM s) "
        "AS is_seed FROM nodes)",
        "ns AS (SELECT count(*) AS ns FROM s)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"r0 AS (SELECT m.node, round({t}, {round_scale}) AS rank "
        "FROM m, ns)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"c{i + 1} AS (SELECT e.dst AS node, "
            f"sum({prev}.rank / deg.deg) AS contrib "
            f"FROM e JOIN deg USING (src) JOIN {prev} ON {prev}.node = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"d{i + 1} AS (SELECT coalesce(sum(rank), 0.0) AS dm FROM {prev} "
            f"WHERE node NOT IN (SELECT src FROM deg))"
        )
        parts.append(
            f"{cur} AS (SELECT m.node, "
            f"round((1.0 - {d}) * {t} + {d} * (coalesce(c{i + 1}.contrib, 0.0) "
            f"+ d{i + 1}.dm * {t}), {round_scale}) AS rank "
            f"FROM m LEFT JOIN c{i + 1} ON c{i + 1}.node = m.node, "
            f"d{i + 1}, ns)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, round(rank, {final_scale}) AS rank FROM r{iters}"
    )


def _dual_rank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    round_scale: int = 10,
) -> DataFrame:
    """(node, pagerank, trustrank) — the T32 and T79 power iterations
    FUSED into one loop for spam_mass: the edge prep (distinct, degree
    join, flag table) is built once instead of twice, and each round is
    ONE edge⋈state join + ONE dst-keyed aggregation producing BOTH
    contribution sums, one two-conditional-sum dangling scan, and one
    state update carrying both rank columns. Per-column arithmetic is
    the respective loop's expression VERBATIM (same per-round
    round(·, round_scale), same teleport/dangling forms), so the fused
    state trajectory is the pair of the two solo trajectories —
    snapshot-verified bit-equal."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    marked = nodes.join(
        F.broadcast(s.withColumn("_is_seed", F.lit(True))), "node", "left"
    ).join(
        deg.select(F.col("src").alias("node"), F.lit(True).alias("_has_out")),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("_is_seed"), F.lit(False)).alias("_is_seed"),
        F.coalesce(F.col("_has_out"), F.lit(False)).alias("_has_out"),
    ).localCheckpoint(eager=True)
    n1 = marked.agg(F.count("*").alias("_n"))
    ns1 = marked.agg(
        F.sum(F.col("_is_seed").cast("long")).alias("_ns")
    )
    e_w = e.join(deg, "src").localCheckpoint(eager=True)

    def _teleport():
        return F.when(
            F.col("_is_seed"), F.lit(1.0) / F.col("_ns")
        ).otherwise(F.lit(0.0))

    state = (
        marked.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(ns1))
        .select(
            "node",
            "_is_seed",
            "_has_out",
            F.round(F.lit(1.0) / F.col("_n"), round_scale).alias("pr"),
            F.round(_teleport(), round_scale).alias("tr"),
        )
        .localCheckpoint(eager=True)
    )

    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(e_w, marked):
        for _ in range(iters):
            contribs = (
                e_w.join(state, e_w.src == state.node)
                .select(
                    F.col("dst").alias("node"),
                    (F.col("pr") / F.col("_deg")).alias("c_pr"),
                    (F.col("tr") / F.col("_deg")).alias("c_tr"),
                )
                .groupBy("node")
                .agg(
                    F.sum("c_pr").alias("_contrib_pr"),
                    F.sum("c_tr").alias("_contrib_tr"),
                )
            )
            dangling = state.filter(~F.col("_has_out")).agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm_pr"),
                F.coalesce(F.sum("tr"), F.lit(0.0)).alias("_dm_tr"),
            )
            state = (
                marked.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .crossJoin(F.broadcast(n1))
                .crossJoin(F.broadcast(ns1))
                .select(
                    "node",
                    "_is_seed",
                    "_has_out",
                    F.round(
                        (1.0 - damping) / F.col("_n")
                        + damping
                        * (
                            F.coalesce(F.col("_contrib_pr"), F.lit(0.0))
                            + F.col("_dm_pr") / F.col("_n")
                        ),
                        round_scale,
                    ).alias("pr"),
                    F.round(
                        (1.0 - damping) * _teleport()
                        + damping
                        * (
                            F.coalesce(F.col("_contrib_tr"), F.lit(0.0))
                            + F.col("_dm_tr") * _teleport()
                        ),
                        round_scale,
                    ).alias("tr"),
                )
                .localCheckpoint(eager=False)
            )
    return state.select(
        "node",
        F.round("pr", 8).alias("pagerank"),
        F.round("tr", 8).alias("trustrank"),
    )


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 4,
    rel_thresh: float = 0.5,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """T121 — link-spam mass estimation (Gyöngyi, Berkhin,
    Garcia-Molina & Pedersen, "Link spam detection based on mass
    estimation", VLDB 2006): how much of a page's PageRank arrives
    from OUTSIDE the trusted good core. With p = PageRank and
    p⁺ = TrustRank (the good-core-personalized rank, both L1-mass-1
    by construction), the paper's estimates are the absolute mass
    M̃ = p − p⁺ and the relative mass m̃ = (p − p⁺)/p; pages whose
    rank is mostly spam-delivered (m̃ above a threshold) are the
    link-farm beneficiaries — the page T79's prose calls
    "high PageRank but low TrustRank", now quantified per node.

    Output: (node, pagerank, trustrank, spam_mass, rel_mass,
    is_spam). Both input ranks are the gate-proven round-8 columns of
    T32/T79; spam_mass = round(p − p⁺, 8) and
    rel_mass = round((p − p⁺)/p, 6) are fixed IEEE expressions over
    them (p > 0 always: the teleport floor (1−d)/n is positive), and
    ``is_spam`` tests the ROUNDED rel_mass — every column engine-exact.
    Seeds, as in T79, are dimension-sized and broadcast.

    Plan shape: the two power iterations run their T32-discipline
    loops unchanged (one edge join + one dst-keyed agg per round,
    localCheckpoint lineage cuts); the composition adds ONE
    node-keyed join of two (node, double) tables and a map-only
    projection. At 10^10 edges both ranks are computed once per crawl
    cycle anyway — this materializes their difference."""
    j = _dual_rank(
        edges, seeds, damping=damping, iters=iters,
        src_col=src_col, dst_col=dst_col, seed_col=seed_col,
    )
    mass = F.round(F.col("pagerank") - F.col("trustrank"), 8)
    rel = F.round(
        (F.col("pagerank") - F.col("trustrank")) / F.col("pagerank"), 6
    )
    return j.select(
        "node",
        "pagerank",
        "trustrank",
        mass.alias("spam_mass"),
        rel.alias("rel_mass"),
        (rel >= F.lit(float(rel_thresh))).alias("is_spam"),
    )


def spam_mass_oracle_sql(
    edges_cte: str,
    seeds_cte: str,
    damping: float = 0.85,
    iters: int = 4,
    rel_thresh: float = 0.5,
) -> str:
    """The composition of the two unrolled-CTE twins: each full
    WITH-statement becomes a derived table, joined on node, with the
    identical mass/relative-mass expressions."""
    pr_sql = pagerank_oracle_sql(edges_cte, damping=damping, iters=iters)
    tr_sql = trustrank_oracle_sql(
        edges_cte, seeds_cte, damping=damping, iters=iters
    )
    return f"""
SELECT pr.node, pr.rank AS pagerank, tr.rank AS trustrank,
       round(pr.rank - tr.rank, 8) AS spam_mass,
       round((pr.rank - tr.rank) / pr.rank, 6) AS rel_mass,
       (round((pr.rank - tr.rank) / pr.rank, 6) >= {rel_thresh!r})
         AS is_spam
FROM ({pr_sql}) pr
JOIN ({tr_sql}) tr ON tr.node = pr.node
"""

"""T85 — k-core decomposition of the link/host graph (Seidman 1983,
"Network structure and minimum degree"; distributed peeling as in
Montresor, De Pellegrini & Miorandi, IEEE TPDS 2013).

The k-core is the unique maximal subgraph in which every node has
degree >= k WITHIN the subgraph. On webgraphs it is the standard
density screen one notch stronger than degree filtering: link farms
and template rings survive a raw-degree cut (every page points at the
hub) but collapse under peeling unless the spam structure is genuinely
dense, while LPA (T61) finds communities and PageRank/TrustRank
(T60/T79) rank them, k-core answers "is this subgraph dense enough to
be load-bearing at all". Crawl QA uses it to pick seed cores (high-k)
and to triage sparse periphery before expensive per-page scoring.

Algorithm: iterated peeling — repeatedly delete every node whose
current degree is < k; the survivors at the fixpoint ARE the k-core
(Seidman's theorem: the order of deletions is irrelevant, so the
result is engine- and partitioning-independent with no tie-break
policy needed — unlike LPA there is nothing to make deterministic, the
fixpoint is unique).

Spark shape: the edge list is bidirected/dedup'd once and
localCheckpointed; each round is ONE degree aggregation (map-side
combined count on 8-byte keys) + TWO left-semi hash joins trimming the
edge list to surviving endpoints, then an edge count() whose change
drives the fixpoint exit — the standard driver-side loop of the
pagerank/LPA family (one slim job per round, rounds bounded by the
peel depth, which on power-law webgraphs is tens, not thousands).
Lineage is cut every ``checkpoint_interval`` rounds. Shuffles carry
(long, long) rows only; no payload column enters the loop. At 10^10
edges a production run pre-partitions the bidirected list by source so
every round's aggregation and semi-joins reuse one layout.

The DuckDB gate twin (``k_core_sql``) unrolls a FIXED number of peel
rounds as chained CTEs (peeling is idempotent once stable, so any
unroll >= the true peel depth yields the exact fixpoint; the driver
gate would surface an under-provisioned unroll as a mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidir(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 100,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """(node, degree) for every node of the k-core, degree counted
    INSIDE the core. Edges are undirected; self-loops and duplicates
    are dropped. ``max_rounds`` is a runaway bound, not a tuning knob —
    the loop exits as soon as a round deletes nothing."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    alive = _bidir(edges, src_col, dst_col).localCheckpoint(eager=True)
    n_edges = alive.count()
    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(alive):
        alive = _peel_loop(alive, n_edges, k, max_rounds, checkpoint_interval)
    return alive.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("degree")
    )


def _peel_loop(alive, n_edges, k, max_rounds, checkpoint_interval):
    for r in range(max_rounds):
        if n_edges == 0:
            break
        deg = alive.groupBy("a").agg(F.count("*").alias("degree"))
        # LAZY: the round's count() job materializes keep through both
        # semi-joins (one job per round instead of two)
        keep = deg.filter(F.col("degree") >= k).select("a").localCheckpoint(
            eager=False
        )
        trimmed = (
            alive.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .select("a", "b")
        )
        if (r + 1) % checkpoint_interval == 0:
            trimmed = trimmed.localCheckpoint(eager=False)
        n_next = trimmed.count()
        alive = trimmed
        if n_next == n_edges:
            break
        n_edges = n_next
    return alive


def k_core_sql(source_cte: str, k: int, rounds: int = 24) -> str:
    """The identical peeling as DuckDB SQL — ``rounds`` explicitly
    unrolled chained CTEs (DuckDB's recursive CTEs allow one
    self-reference, but a peel round needs the previous round twice:
    degrees AND the endpoint trim). ``source_cte`` must define
    ``src(src, dst)``. Exact whenever ``rounds`` >= the peel depth;
    idempotent beyond it."""
    # every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    # peel level references the previous one three times (degrees + both
    # endpoint trims) — inlined, the plan would blow up 3^rounds
    parts = [
        source_cte,
        "e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
        "SELECT src AS a, dst AS b FROM src WHERE src <> dst "
        "UNION ALL SELECT dst AS a, src AS b FROM src WHERE src <> dst))",
    ]
    for r in range(rounds):
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT a FROM e{r} GROUP BY a "
            f"HAVING count(*) >= {k})"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e "
            f"JOIN k{r} x ON e.a = x.a JOIN k{r} y ON e.b = y.a)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT a AS node, count(*) AS degree FROM e{rounds} GROUP BY a"
    )

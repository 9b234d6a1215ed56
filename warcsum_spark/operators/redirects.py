"""Redirect-chain resolution: follow HTTP 3xx chains to the final URL.

Crawlers record redirects as (src_url, location) edges; downstream
everything — frontier dedup, canonical URL assignment, link-graph
construction, WARC `revisit` bookkeeping — needs the CHAIN collapsed:
for every source, the terminal URL it ultimately lands on, the hop
count, and an unresolved flag for loops / chains past the client hop
budget (every real HTTP client enforces one; curl's default --max-redirs
is 50, browsers use ~20).

Semantics: each URL has at most one outgoing redirect (one Location
header). A source RESOLVES if its chain reaches a URL with no outgoing
edge within ``max_hops`` edges; otherwise (cycle, or chain longer than
the budget) it is unresolved with NULL final/hops — exactly what a
bounded client observes, and exactly what a bounded recursive CTE
computes, which is what the driver-gate DuckDB oracle does.

Spark-first shape — pointer DOUBLING, not step-by-step walking: the
state table (src, ptr, hops, done) holds "ptr is the node ``hops``
redirect edges from src". Each round self-joins the state table on
ptr = src, composing every path with itself: path lengths double per
round, so ceil(log2(max_hops)) + 1 rounds cover any budget (6 rounds
for 50 hops, vs 50 sequential-join rounds for a step walker — the
identical O(log) trick as star-contraction CC, clusters.py). Every
round is ONE hash exchange of slim (string src, string ptr, int, bool)
rows; localCheckpoint per round truncates lineage (iterative-operator
precedent, clusters.py / superstep.py).

Skew note: unlike transitive closure, the state is FUNCTIONAL (one row
per src forever — no row explosion); hot intermediate nodes make hot
join keys at the build side of each round's join, which AQE skew-join
splits.

Reference mapping: warcsum itself never follows redirects (digests are
per-record); this is §2.12 frontier-adjacent surface (SURVEY T52).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One row per distinct src: (src, final_url, hops, resolved).

    resolved=true  → final_url/hops filled, chain ends within max_hops.
    resolved=false → NULLs: a cycle, or a chain longer than max_hops
    (indistinguishable to a bounded client, deliberately not split).

    Multiple outgoing edges per src (malformed input) are collapsed
    deterministically to the smallest dst before resolution.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")

    state = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("ptr"))
        .select("src", "ptr", F.lit(1).alias("hops"), F.lit(False).alias("done"))
        .localCheckpoint()
    )

    rounds = max(1, math.ceil(math.log2(max_hops)) + 1)
    # plain per-round planning in the small-state regime (no-op at
    # production scale) + lazy per-round checkpoints — the
    # pagerank.py discipline
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(state):
        state = _double_loop(state, rounds)

    ok = F.col("done") & (F.col("hops") <= max_hops)
    return state.select(
        "src",
        F.when(ok, F.col("ptr")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


def _double_loop(state, rounds):
    for _ in range(rounds):
        jump = state.select(
            F.col("src").alias("j_src"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
            F.col("done").alias("j_done"),
        )
        state = (
            state.join(jump, state["ptr"] == jump["j_src"], "left")
            .select(
                "src",
                F.when(F.col("done") | F.col("j_src").isNull(), F.col("ptr"))
                .otherwise(F.col("j_ptr"))
                .alias("ptr"),
                F.when(F.col("done") | F.col("j_src").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("j_hops"))
                .alias("hops"),
                # done: already done, or ptr has no outgoing edge, or the
                # composed suffix was itself complete
                (F.col("done") | F.col("j_src").isNull() | F.col("j_done")).alias(
                    "done"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return state

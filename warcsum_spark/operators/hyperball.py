"""T86 — neighborhood function + harmonic centrality (HyperBall).

Harmonic centrality H(v) = Σ_{u≠v} 1/d(u→v) is the ranking Common
Crawl actually publishes for hosts (their host-level rank files are
harmonic-centrality ordered) and the centrality Boldi & Vigna's "Axioms
for centrality" (Internet Math. 2014) single out as the principled
replacement for closeness on disconnected webgraphs: unreachable pairs
contribute 0 instead of poisoning the sum. It is computed from the
*neighborhood function* |B_t(v)| — how many nodes are within t hops —
whose per-radius increments are exactly the count-at-distance-t terms.

Two tiers, mirroring the entropy_docs / entropy_docs_bytes precedent:

* **Exact tier** (``neighborhood_exact`` / ``harmonic_exact``) — the
  oracle/driver-gated tier. All-balls BFS as pair propagation: the
  frontier is the set of (node, member) pairs first discovered at the
  previous radius; one round = frontier ⋈ edges (keyed on the edge
  head) + distinct + anti-join against the visited pair set — the
  hopdist.py discipline, so a pair enters exactly once at its true
  shortest distance and total work is O(Σ_v |B_max_t(v)|) pairs, not
  O(pairs × rounds). That sum is quadratic on a well-connected graph,
  which is WHY this tier is the validation path: it exists to certify
  the sketch tier and to gate the driver query on dimension-sized
  graphs (host graphs, seed cores), and its cost is stated, not hidden.
* **Sketch tier** (``hyperball`` / ``harmonic_hll``) — the 100 TB path:
  HyperBall (Boldi & Vigna, "In-core computation of geometric
  centralities with HyperBall", ICDMW 2013). Each node carries a
  HyperLogLog counter of its ball; one radius step is counter(v) ∪=
  counter(w) for every edge v→w. Here the counter table IS a DataFrame
  of (node, bucket, max_rank) registers (the T43 hll.py representation),
  so the union-along-edges step is ONE hash join edges⋈registers plus
  ONE grouped max — slim (long, int, int) rows, bounded by nodes × 2^p,
  the raw graph payload never reshuffles. Convergence is detected from
  two monotone scalars (register-row count + Σ max_rank): union+max
  only ever adds rows or raises ranks, so both unchanged ⟺ fixpoint.

Exactness contract for the gate: per-distance counts are integers, and
harmonic is emitted as an exact integer numerator Σ cnt_d · (L // d)
with L = lcm(1..max_t), divided by L in ONE IEEE operation — the
priority-sampling trick (psample.py), so no cross-engine float-sum
order can flip a bit.

Direction: ``B_t(v)`` follows OUT-edges of the graph given. Harmonic
centrality counts nodes that can REACH v, so callers pass the
REVERSED link graph (the driver query does; Boldi & Vigna run HyperBall
on the transpose for exactly this reason).

No reference counterpart (warcsum's unit is the WARC record,
warcsum.c:881–1011); §2.12 training/webgraph surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.operators.hll import hll_columns, hll_estimate


def _edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .filter(F.col("_src") != F.col("_dst"))
        .distinct()
    )


def _nodes(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )


def neighborhood_exact(
    edges: DataFrame,
    max_t: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, dist, cnt): for every node of the graph and 1 <= dist <=
    ``max_t``, the number of nodes whose shortest out-distance from
    ``node`` is exactly ``dist`` (the neighborhood-function increments).
    Nodes with an empty out-ball simply have no rows. Duplicate edges
    and self-loops are dropped."""
    if max_t < 1:
        raise ValueError(f"max_t must be >= 1, got {max_t}")
    e = _edges(edges, src_col, dst_col).localCheckpoint(eager=True)
    visited = (
        _nodes(e)
        .select("node", F.col("node").alias("member"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    # plain per-round planning in the small-state regime (no-op at
    # production scale) — see session.loop_plan_conf
    from warcsum_spark.session import loop_plan_conf

    with loop_plan_conf(visited, e):
        rounds = _ball_rounds(e, visited, frontier, max_t)
    if not rounds:
        spark = edges.sparkSession
        return spark.createDataFrame([], "node long, dist int, cnt bigint")
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.select("node", "dist", "cnt")


def _ball_rounds(e, visited, frontier, max_t):
    rounds: list[DataFrame] = []
    for t in range(1, max_t + 1):
        nxt = (
            e.join(frontier, e["_dst"] == frontier["node"])
            .select(F.col("_src").alias("node"), "member")
            .distinct()
            .join(visited, ["node", "member"], "left_anti")
            .localCheckpoint(eager=False)
        )
        # one job: count() materializes the lazy checkpoint and tests
        # emptiness (the hopdist.py discipline)
        if nxt.count() == 0:
            break
        rounds.append(
            nxt.groupBy("node").agg(
                F.lit(t).cast("int").alias("dist"),
                F.count("*").alias("cnt"),
            )
        )
        # re-compacted per round (see hopdist.py: a lazy union pile makes
        # the per-round anti-join re-shuffle ever more tiny partitions);
        # LAZY checkpoint — the next round's count() materializes it
        # through the anti-join, one job per round instead of two
        # narrow coalesce caps the union's partition-list growth — see
        # hopdist.py::_bfs_loop
        tgt = max(
            visited.rdd.getNumPartitions(), nxt.rdd.getNumPartitions()
        )
        visited = (
            visited.unionByName(nxt).coalesce(tgt).localCheckpoint(eager=False)
        )
        frontier = nxt
    return rounds


def harmonic_exact(
    edges: DataFrame,
    max_t: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, reached, harmonic) for EVERY node of the graph:
    ``reached`` = |B_max_t(node)| - 1 (nodes within max_t out-hops,
    excluding self), ``harmonic`` = Σ_d cnt_d / d truncated at max_t.
    Emitted as an exact BIGINT numerator over L = lcm(1..max_t) and ONE
    IEEE division, so independent engines agree bit-for-bit. Nodes
    whose ball is empty come back with (0, 0.0)."""
    L = math.lcm(*range(1, max_t + 1))
    counts = neighborhood_exact(edges, max_t, src_col, dst_col)
    agg = counts.groupBy("node").agg(
        F.sum("cnt").alias("reached"),
        F.sum(F.expr(f"cnt * ({L} div dist)")).alias("_hnum"),
    )
    nodes = _nodes(_edges(edges, src_col, dst_col))
    return nodes.join(agg, "node", "left").select(
        "node",
        F.coalesce("reached", F.lit(0)).cast("long").alias("reached"),
        (
            F.coalesce("_hnum", F.lit(0)).cast("double") / F.lit(float(L))
        ).alias("harmonic"),
    )


def hyperball(
    edges: DataFrame,
    max_t: int,
    p: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, t, est_ball) — the HyperBall sketch tier: HLL-estimated
    |B_t(node)| (self included) for t = 0..max_t, stopping early at the
    register fixpoint. One radius step = one edges⋈registers hash join
    + one grouped max over (node, bucket) — register rows only; the
    graph's payload columns never enter the loop. Estimates inherit
    hll.py's accuracy envelope (±1.04/sqrt(2^p) raw; linear-counting
    regime — balls well under 2^p — is much tighter)."""
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    e = _edges(edges, src_col, dst_col).localCheckpoint(eager=True)
    bucket, rank = hll_columns(F.col("node"), p)
    regs = (
        _nodes(e)
        .select("node", bucket.alias("bucket"), rank.alias("max_rank"))
        .localCheckpoint(eager=True)
    )
    ests = [
        hll_estimate(regs, ["node"], p).withColumn(
            "t", F.lit(0).cast("int")
        )
    ]
    state = regs.agg(
        F.count("*").alias("n"), F.sum("max_rank").alias("s")
    ).first()
    for t in range(1, max_t + 1):
        cand = e.join(regs, e["_dst"] == regs["node"]).select(
            F.col("_src").alias("node"), "bucket", "max_rank"
        )
        regs = (
            regs.unionByName(cand)
            .groupBy("node", "bucket")
            .agg(F.max("max_rank").alias("max_rank"))
            .localCheckpoint(eager=False)
        )
        # the fixpoint agg materializes the lazy checkpoint in the same
        # job (the hopdist.py discipline)
        nxt = regs.agg(
            F.count("*").alias("n"), F.sum("max_rank").alias("s")
        ).first()
        # union+max is monotone: rows only appear, ranks only rise —
        # both scalars unchanged ⟺ every register unchanged ⟺ fixpoint
        if (nxt["n"], nxt["s"]) == (state["n"], state["s"]):
            break
        state = nxt
        ests.append(
            hll_estimate(regs, ["node"], p).withColumn(
                "t", F.lit(t).cast("int")
            )
        )
    out = ests[0]
    for d in ests[1:]:
        out = out.unionByName(d)
    return out.select("node", "t", F.col("est_distinct").alias("est_ball"))


def harmonic_hll(
    edges: DataFrame,
    max_t: int,
    p: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, est_reached, est_harmonic) from the sketch tier:
    est_harmonic = Σ_t (N_t - N_{t-1}) / t over the HyperBall
    neighborhood-function estimates (Boldi & Vigna 2013 eq. for
    harmonic from ball increments). Approximate by construction —
    pytest-gated against ``harmonic_exact`` within tolerance, never
    oracle-gated."""
    balls = hyperball(edges, max_t, p, src_col, dst_col)
    prev = balls.select(
        "node",
        (F.col("t") + 1).alias("t"),
        F.col("est_ball").alias("_prev"),
    )
    diffs = balls.filter(F.col("t") >= 1).join(prev, ["node", "t"], "left")
    # a truncated fixpoint (early exit) has no rows past the last t —
    # increments there are genuinely 0, so the sum is already complete
    agg = diffs.groupBy("node").agg(
        F.sum(F.col("est_ball") - F.col("_prev")).alias("est_reached"),
        F.sum(
            (F.col("est_ball") - F.col("_prev")) / F.col("t").cast("double")
        ).alias("est_harmonic"),
    )
    nodes = _nodes(_edges(edges, src_col, dst_col))
    return nodes.join(agg, "node", "left").select(
        "node",
        F.round(F.coalesce("est_reached", F.lit(0.0)), 4).alias(
            "est_reached"
        ),
        F.round(F.coalesce("est_harmonic", F.lit(0.0)), 4).alias(
            "est_harmonic"
        ),
    )


def harmonic_sql(source_cte: str, max_t: int) -> str:
    """The exact tier as DuckDB SQL for the driver gate — ``max_t``
    explicitly unrolled BFS rounds (each level is referenced by the
    next round's join AND the running ball union, so every CTE is
    MATERIALIZED — the k_core_sql discipline). ``source_cte`` must
    define ``src(src, dst)``. Harmonic uses the same exact-integer
    numerator over L = lcm(1..max_t) and one division."""
    L = math.lcm(*range(1, max_t + 1))
    parts = _bfs_sql_parts(source_cte, max_t)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
, counts AS (
  SELECT node, dist, count(*) AS cnt
  FROM b{max_t} WHERE dist >= 1 GROUP BY node, dist
), agg AS (
  SELECT node, CAST(sum(cnt) AS BIGINT) AS reached,
         CAST(sum(cnt * ({L} // dist)) AS BIGINT) AS hnum
  FROM counts GROUP BY node
)
SELECT n.node,
       coalesce(a.reached, 0)::BIGINT AS reached,
       CAST(coalesce(a.hnum, 0) AS DOUBLE) / {float(L)} AS harmonic
FROM nodes n LEFT JOIN agg a ON n.node = a.node
"""
    )


def _bfs_sql_parts(source_cte: str, max_t: int) -> list[str]:
    """The shared unrolled-BFS CTE prefix (``e``/``nodes``/``b{t}``/
    ``f{t}``) used by ``harmonic_sql`` and ``effective_diameter_sql``
    — each level is referenced by the next round's join AND the
    running ball union, so every CTE is MATERIALIZED (the k_core_sql
    discipline). ``source_cte`` must define ``src(src, dst)``."""
    parts = [
        source_cte,
        "e AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM src "
        "WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT s AS node FROM e "
        "UNION SELECT d FROM e)",
        "b0 AS MATERIALIZED (SELECT node, node AS member, 0 AS dist "
        "FROM nodes)",
        "f0 AS MATERIALIZED (SELECT node, member FROM b0)",
    ]
    for t in range(1, max_t + 1):
        parts.append(
            f"f{t} AS MATERIALIZED ("
            f"SELECT node, member FROM ("
            f"SELECT DISTINCT e.s AS node, f.member "
            f"FROM e JOIN f{t - 1} f ON e.d = f.node) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM b{t - 1} b "
            f"WHERE b.node = n.node AND b.member = n.member))"
        )
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT * FROM b{t - 1} "
            f"UNION ALL SELECT node, member, {t} AS dist FROM f{t})"
        )
    return parts


def distance_distribution(
    edges: DataFrame,
    max_t: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """T105 — the whole-graph distance distribution N(t) (Palmer,
    Gibbons & Faloutsos KDD 2002; the quantity HyperANF estimates):
    ``(dist, pairs, cum_pairs)`` where ``pairs`` counts ordered
    reachable pairs at shortest distance exactly ``dist`` (1-based;
    self-pairs excluded — pinned) and ``cum_pairs`` is the running
    N(dist), truncated at the ``max_t`` horizon. One dimension-sized
    table (≤ max_t rows) aggregated from the exact all-balls BFS; the
    cumulative window runs on those ≤ max_t rows."""
    counts = neighborhood_exact(edges, max_t, src_col, dst_col)
    per_t = counts.groupBy("dist").agg(F.sum("cnt").alias("pairs"))
    w = Window.orderBy("dist")
    return per_t.withColumn("cum_pairs", F.sum("pairs").over(w)).select(
        "dist", "pairs", "cum_pairs"
    )


def effective_diameter(
    edges: DataFrame,
    max_t: int,
    q_num: int = 9,
    q_den: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """T105 — interpolated effective diameter (Leskovec, Kleinberg &
    Faloutsos KDD 2005 convention; the headline statistic of HyperANF
    and of every webgraph release): the smallest t such that N(t) ≥
    (q_num/q_den)·N(horizon), linearly interpolated inside that step.

    One row: ``(total_pairs, eff_at, effective_diameter)``. Pinned,
    engine-portable arithmetic: the threshold test is the exact
    integer comparison ``cum·q_den ≥ total·q_num`` (never a float
    quantile), and the interpolation is ONE IEEE division of exact
    integers — ``eff = (t−1) + (total·q_num − prev·q_den) /
    (q_den·(cum − prev))`` — rounded to 6, bit-identical cross-engine.
    ``total`` is N at the ``max_t`` horizon (the harmonic_exact
    truncation contract: pick max_t ≥ the graph's eccentricity for the
    untruncated statistic). A graph with no reachable pairs yields an
    empty result — pinned. The candidate scan is a TakeOrdered over
    the ≤ max_t distribution rows, never a global sort."""
    dd = distance_distribution(edges, max_t, src_col, dst_col)
    wall = Window.partitionBy()
    flagged = dd.withColumn("total_pairs", F.max("cum_pairs").over(wall))
    sat = flagged.filter(
        F.col("cum_pairs") * F.lit(int(q_den))
        >= F.col("total_pairs") * F.lit(int(q_num))
    )
    first = sat.orderBy("dist").limit(1)
    prev = F.col("cum_pairs") - F.col("pairs")
    eff = F.round(
        (F.col("dist") - 1).cast("double")
        + (
            F.col("total_pairs") * F.lit(int(q_num))
            - prev * F.lit(int(q_den))
        ).cast("double")
        / (F.col("pairs") * F.lit(int(q_den))).cast("double"),
        6,
    )
    return first.select(
        "total_pairs",
        F.col("dist").cast("long").alias("eff_at"),
        eff.alias("effective_diameter"),
    )


def effective_diameter_sql(
    source_cte: str, max_t: int, q_num: int = 9, q_den: int = 10
) -> str:
    """The IDENTICAL pinned semantics for DuckDB — same unrolled
    MATERIALIZED BFS prefix as ``harmonic_sql``, same exact-integer
    threshold, same single pinned division."""
    parts = _bfs_sql_parts(source_cte, max_t)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
, counts AS (
  SELECT node, dist, count(*) AS cnt
  FROM b{max_t} WHERE dist >= 1 GROUP BY node, dist
), per_t AS (
  SELECT dist, CAST(sum(cnt) AS BIGINT) AS pairs FROM counts GROUP BY dist
), cum AS (
  SELECT dist, pairs,
         CAST(sum(pairs) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs
  FROM per_t
), tot AS (
  SELECT dist, pairs, cum_pairs, max(cum_pairs) OVER () AS total_pairs
  FROM cum
), sat AS (
  SELECT * FROM tot
  WHERE cum_pairs * {int(q_den)} >= total_pairs * {int(q_num)}
  ORDER BY dist LIMIT 1
)
SELECT total_pairs,
       CAST(dist AS BIGINT) AS eff_at,
       round(CAST(dist - 1 AS DOUBLE)
             + CAST(total_pairs * {int(q_num)}
                    - (cum_pairs - pairs) * {int(q_den)} AS DOUBLE)
               / CAST(pairs * {int(q_den)} AS DOUBLE), 6)
         AS effective_diameter
FROM sat
"""
    )

"""T95 — directed degree assortativity of the link graph (Newman,
"Assortative mixing in networks", PRL 2002; directed four-profile form
per Foster et al. PNAS 2010: the Pearson correlation between endpoint
degrees over edges, one coefficient per (out|in, out|in) combination).

Why a crawl engine wants it: assortativity is the one-number structure
diagnostic the degree distribution can't see. The web is famously
DISassortative (hubs link to leaves, r < 0); a crawl whose link graph
turns assortative (r > 0) is the signature of link farms and mirror
rings (dense like-to-like cores), and r ≈ 0 on a supposed site-level
graph usually means URL canonicalization broke (every page became its
own host). Complements T65 (local clustering), T85 (k-core density),
T32/T79 (rank): those score NODES; this scores the MIXING.

Pinned, engine-portable semantics:

* degrees: ``out(u)`` = rows with src = u, ``in(u)`` = rows with
  dst = u — multi-edges count multiply, self-loops contribute to both
  (callers dedupe first if they mean simple graphs; pinned);
* for each edge (u, v), the four profiles pair x ∈ {out(u), in(u)}
  with y ∈ {out(v), in(v)};
* ``r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))``
  over edges. Degrees are INTEGERS, so every sum is accumulated
  exactly in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — associative,
  partitioning-proof (the zipf.py discipline with zero ln error: the
  only IEEE ops are the final cast-multiply-sqrt-divide chain, pinned,
  and IEEE sqrt is correctly rounded — bit-identical cross-engine).
  Zero-variance sides yield NULL (a regular graph has no mixing to
  correlate). Rounded to 6.

Plan shape at 100 TB: two map-side-combined degree aggregations (node-
grain dimension tables vs the edge list), TWO slim hash joins to pin
(out, in) onto each endpoint — (long, long, long) rows, the same
src/dst keying every graph pass here uses — then ONE scalar aggregate.
No windows, no collects, no Python.

No reference counterpart; the coefficient is the published one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

#: the four directed profiles: (name, src-side degree, dst-side degree)
PROFILES = (
    ("out_out", "src_out", "dst_out"),
    ("out_in", "src_out", "dst_in"),
    ("in_out", "src_in", "dst_out"),
    ("in_in", "src_in", "dst_in"),
)


def _pearson(n: Column, sx, sy, sxy, sxx, syy) -> Column:
    vx = (n * sxx) - (sx * sx)
    vy = (n * syy) - (sy * sy)
    cov = (n * sxy) - (sx * sy)
    ok = (vx != 0) & (vy != 0)
    r = cov.cast("double") / F.sqrt(
        vx.cast("double") * vy.cast("double")
    )
    return F.when(ok, F.round(r, 6))


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """ONE row: (n_edges, n_nodes, r_out_out, r_out_in, r_in_out,
    r_in_in). See module docstring for the pinned arithmetic."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    outd = e.groupBy("src").agg(F.count("*").alias("deg_out"))
    ind = e.groupBy("dst").agg(F.count("*").alias("deg_in"))
    # both cached: node-grain tables with two consumers each (deg feeds
    # both endpoint attaches; nodes feeds deg and the n_nodes scalar) —
    # uncached each consumer re-runs the degree aggregations
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    deg = (
        nodes.join(outd, nodes.node == outd.src, "left")
        .join(ind, nodes.node == ind.dst, "left")
        .select(
            "node",
            F.coalesce("deg_out", F.lit(0)).alias("deg_out"),
            F.coalesce("deg_in", F.lit(0)).alias("deg_in"),
        )
        .cache()
    )
    ends = (
        e.join(
            deg.select(
                F.col("node").alias("src"),
                F.col("deg_out").alias("src_out"),
                F.col("deg_in").alias("src_in"),
            ),
            "src",
        ).join(
            deg.select(
                F.col("node").alias("dst"),
                F.col("deg_out").alias("dst_out"),
                F.col("deg_in").alias("dst_in"),
            ),
            "dst",
        )
    )
    cols = {"src_out", "src_in", "dst_out", "dst_in"}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in sorted(cols):
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c).cast(_DEC) * F.col(c).cast(_DEC)).alias(
                f"ss_{c}"
            )
        )
    for name, a, b in PROFILES:
        aggs.append(
            F.sum(F.col(a).cast(_DEC) * F.col(b).cast(_DEC)).alias(
                f"sp_{name}"
            )
        )
    sums = ends.agg(*aggs)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    row = sums.crossJoin(F.broadcast(n_nodes))
    n = F.col("n").cast(_DEC)
    out_cols = [
        F.col("n").alias("n_edges"),
        F.col("n_nodes"),
    ]
    for name, a, b in PROFILES:
        out_cols.append(
            _pearson(
                n,
                F.col(f"s_{a}"),
                F.col(f"s_{b}"),
                F.col(f"sp_{name}"),
                F.col(f"ss_{a}"),
                F.col(f"ss_{b}"),
            ).alias(f"r_{name}")
        )
    return row.select(*out_cols)


def assortativity_sql(edges_sql: str) -> str:
    """The IDENTICAL pinned arithmetic for DuckDB over ``edges_sql``
    (a SELECT producing (src, dst))."""
    sums = []
    for c in sorted({"src_out", "src_in", "dst_out", "dst_in"}):
        sums.append(f"sum(CAST({c} AS HUGEINT)) AS s_{c}")
        sums.append(
            f"sum(CAST({c} AS HUGEINT) * CAST({c} AS HUGEINT)) AS ss_{c}"
        )
    for name, a, b in PROFILES:
        sums.append(
            f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT))"
            f" AS sp_{name}"
        )
    rs = []
    for name, a, b in PROFILES:
        vx = f"((CAST(n AS HUGEINT) * ss_{a}) - (s_{a} * s_{a}))"
        vy = f"((CAST(n AS HUGEINT) * ss_{b}) - (s_{b} * s_{b}))"
        cov = f"((CAST(n AS HUGEINT) * sp_{name}) - (s_{a} * s_{b}))"
        rs.append(
            f"CASE WHEN {vx} <> 0 AND {vy} <> 0 THEN round("
            f"CAST({cov} AS DOUBLE) / sqrt(CAST({vx} AS DOUBLE)"
            f" * CAST({vy} AS DOUBLE)), 6) END AS r_{name}"
        )
    return f"""
WITH e AS ({edges_sql}),
outd AS (SELECT src, count(*)::BIGINT AS deg_out FROM e GROUP BY src),
ind AS (SELECT dst, count(*)::BIGINT AS deg_in FROM e GROUP BY dst),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (
  SELECT n.node, coalesce(o.deg_out, 0) AS deg_out,
         coalesce(i.deg_in, 0) AS deg_in
  FROM nodes n
  LEFT JOIN outd o ON n.node = o.src
  LEFT JOIN ind i ON n.node = i.dst
), ends AS (
  SELECT ds.deg_out AS src_out, ds.deg_in AS src_in,
         dd.deg_out AS dst_out, dd.deg_in AS dst_in
  FROM e
  JOIN deg ds ON e.src = ds.node
  JOIN deg dd ON e.dst = dd.node
), sums AS (
  SELECT count(*)::BIGINT AS n, {', '.join(sums)} FROM ends
), nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes)
SELECT n AS n_edges, n_nodes, {', '.join(rs)}
FROM sums CROSS JOIN nn
"""

"""T65 — triangle counting + local clustering coefficient on the
host/link graph.

Link farms and mirror rings are DENSE: their hosts close triangles at
rates organic link neighborhoods never reach, so the local clustering
coefficient c(v) = 2·T(v) / (d(v)·(d(v)−1)) is a standard crawl-QA
spam signal (and the global triangle count tracks graph health across
crawls). Connected components (T3/T48) and communities (T61) say who
is together; triangles say how tightly.

Algorithm: the degree-ordered node-iterator (Schank & Wagner 2005 —
the same orientation trick every distributed triangle counter uses,
e.g. Suri & Vassilvitskii WWW'11). Orient each undirected edge from
the endpoint with the SMALLER (degree, id) to the larger; then every
triangle has exactly one node with two out-edges in it, so

    wedges  = oriented ⋈ oriented on the anchor node  (b < c by id)
    triangles = wedges ⋈ canonical undirected edges on (least, greatest)

counts each triangle exactly once, and the orientation bounds every
node's out-degree by O(sqrt(m)) — the wedge explosion that makes the
naive node-iterator quadratic on high-degree hubs cannot happen.

Spark shape: degrees = one node-keyed agg sharing the edge exchange;
orientation is a map-side expression over the degree-joined edge list;
the wedge join and the closing-edge join are plain hash equi-joins on
(node) and (least, greatest) — the closing join deliberately keys on
the CANONICAL id pair, not the orientation, so it stays an equi-join
(an OR over the two orientations would force a nested-loop plan).
Shuffles carry (long, long) / (long, long, long) rows only. Per-node
triangle counts explode each found triangle into its three corners —
3 rows per triangle, grouped on node id.

Float stance: the coefficient is the only float — one division,
rounded to 6 at output (the repo-wide libm/order-noise discipline).

No reference counterpart (warcsum has no graph operators); algorithm
public (Schank & Wagner SEA 2005; Suri & Vassilvitskii WWW 2011).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Distinct undirected edges as (lo, hi) id pairs, self-loops
    dropped."""
    return (
        edges.select(
            F.least(src_col, dst_col).alias("lo"),
            F.greatest(src_col, dst_col).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree, triangles, clustering) for every node of the
    undirected simple graph induced by ``edges``: triangle membership
    count and local clustering coefficient (0.0 where degree < 2),
    rounded to 6."""
    canon = _canonical_edges(edges, src_col, dst_col).localCheckpoint(
        eager=False
    )
    deg = (
        canon.select(F.col("lo").alias("node"))
        .unionByName(canon.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # orient: smaller (degree, id) -> larger; total order, no ties
    dl = deg.select(F.col("node").alias("lo"), F.col("degree").alias("dl"))
    dh = deg.select(F.col("node").alias("hi"), F.col("degree").alias("dh"))
    flip = (F.col("dh") < F.col("dl")) | (
        (F.col("dh") == F.col("dl")) & (F.col("hi") < F.col("lo"))
    )
    oriented = (
        canon.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(flip, F.col("hi")).otherwise(F.col("lo")).alias("u"),
            F.when(flip, F.col("lo")).otherwise(F.col("hi")).alias("v"),
        )
    )
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(
        b,
        (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v")),
    ).select(
        F.col("a.u").alias("anchor"),
        F.col("a.v").alias("lo"),  # a.v < b.v: already the canonical pair
        F.col("b.v").alias("hi"),
    )
    tris = wedges.join(canon, ["lo", "hi"])
    per_node = (
        tris.select(F.explode(F.array("anchor", "lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            (F.lit(2.0) * F.col("triangles"))
            / (F.col("degree").cast("double") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "node", "left")
        .withColumn("triangles", F.coalesce("triangles", F.lit(0)))
        .select("node", "degree", "triangles", coeff.alias("clustering"))
    )


def global_triangle_count(edges: DataFrame, src_col: str = "src",
                          dst_col: str = "dst") -> DataFrame:
    """One row: (n_triangles,) — Σ per-node triangles / 3."""
    per = triangle_counts(edges, src_col, dst_col)
    return per.agg(
        (F.sum("triangles") / F.lit(3)).cast("long").alias("n_triangles")
    )


def triangles_oracle_sql(edges_cte: str) -> str:
    """The identical orientation + wedge-close counting in DuckDB;
    ``edges_cte`` yields (src, dst)."""
    return f"""
WITH raw AS MATERIALIZED ({edges_cte}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src <> dst
),
deg AS MATERIALIZED (
  SELECT node, count(*) AS degree FROM (
    SELECT lo AS node FROM canon UNION ALL SELECT hi FROM canon
  ) GROUP BY node
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN dh.degree < dl.degree
              OR (dh.degree = dl.degree AND canon.hi < canon.lo)
         THEN canon.hi ELSE canon.lo END AS u,
         CASE WHEN dh.degree < dl.degree
              OR (dh.degree = dl.degree AND canon.hi < canon.lo)
         THEN canon.lo ELSE canon.hi END AS v
  FROM canon
  JOIN deg dl ON dl.node = canon.lo
  JOIN deg dh ON dh.node = canon.hi
),
tris AS MATERIALIZED (
  SELECT a.u AS anchor, a.v AS lo, b.v AS hi
  FROM oriented a JOIN oriented b ON a.u = b.u AND a.v < b.v
  JOIN canon ON canon.lo = a.v AND canon.hi = b.v
),
per_node AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT anchor AS node FROM tris
    UNION ALL SELECT lo FROM tris
    UNION ALL SELECT hi FROM tris
  ) GROUP BY node
)
SELECT deg.node, deg.degree,
       coalesce(per_node.triangles, 0) AS triangles,
       CASE WHEN deg.degree >= 2 THEN
         round(2.0 * coalesce(per_node.triangles, 0)
               / (CAST(deg.degree AS DOUBLE) * (deg.degree - 1)), 6)
       ELSE 0.0 END AS clustering
FROM deg LEFT JOIN per_node ON per_node.node = deg.node
"""

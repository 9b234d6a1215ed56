"""T107 — Newman modularity of a community assignment over the link /
host graph (Newman & Girvan, Phys. Rev. E 69, 026113 (2004); Newman,
PNAS 103(23) 2006 for the now-standard Q definition).

Why a crawl engine wants it: T61 (LPA), T3/T48 (connected components)
and T77 (cluster splits) all PRODUCE partitions of the webgraph, and
modularity is the standard one-number answer to "did that partition
find real structure or noise". Q near 0 means the communities are no
denser than a degree-preserving random rewiring; Q in the 0.3–0.7
band is the published signature of genuine community structure
(Newman 2004 §IV). Crawl QA reads it exactly like T97's concentration
indices: before/after evidence for mirror-farm collapse, link-ring
isolation, and template-family grouping.

Pinned, engine-portable definition. The graph is normalized the way
lpa.py normalizes it (undirected, self-loops dropped, duplicate
edges collapsed); with m = |E| canonical undirected edges, degree
d_v = |distinct neighbors of v|, L_c = edges with BOTH endpoints in
community c, and D_c = sum of d_v over members of c:

    Q = sum_c L_c / m  -  sum_c (D_c / 2m)^2
      = (4m * sum_c L_c  -  sum_c D_c^2) / (4 m^2)

Every sum is over INTEGERS accumulated exactly in DECIMAL(38,0) /
HUGEINT (the concentration.py / zipf.py discipline): 4m*L and D_c^2
reach ~1e21 at 10^10 edges, far past BIGINT but comfortably inside
38 digits. The ONLY IEEE operation is the one final division, rounded
to 6 — bit-identical cross-engine and partitioning-proof.

Plan shape at 100 TB: every exchange carries (long, long) or
(long,) rows — the canonical-edge distinct, the degree groupBy, two
label-attach joins on node id, one groupBy(label), one scalar agg.
Document/page payloads never enter; the labels frame is exactly T61's
output so the whole thing chains onto label_propagation's plan
lazily. Nodes present in ``labels`` but absent from the edge list
(isolated nodes) contribute D_c = 0 and no intra edges — they cannot
change Q, matching the paper's convention.

No reference counterpart; the index is the published one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """ONE row: (n_nodes, n_edges, n_communities, intra_edges,
    modularity). ``labels`` must cover every endpoint (T61's contract —
    its node set IS the edge list's node set); see module docstring for
    the pinned arithmetic."""
    # cached: three branches consume the canonical edge list (degrees,
    # intra-edge count, m) — slim (long, long) rows, community-detection
    # input grain, the lsh_candidate_pairs cache precedent
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("label")
    )
    # d_v = distinct-neighbor degree over the canonical edge list
    degrees = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # D_c and the community count come from the label table; isolated
    # labeled nodes keep d = 0 via the left join
    d_c = (
        lab.join(degrees, "node", "left")
        .select("label", F.coalesce("d", F.lit(0)).alias("d"))
        .groupBy("label")
        .agg(F.sum(F.col("d").cast(_DEC)).alias("d_c"))
    )
    # L_c: attach both endpoint labels, keep matching pairs
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    intra = (
        canon.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("l_c"))
    )
    per_comm = d_c.join(intra, "label", "left").select(
        "label",
        F.col("d_c"),
        F.coalesce("l_c", F.lit(0)).cast(_DEC).alias("l_c"),
    )
    m = canon.agg(F.count(F.lit(1)).cast(_DEC).alias("m"))
    zero = F.lit(0).cast(_DEC)
    sums = per_comm.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.coalesce(F.sum("l_c"), zero).alias("s_l"),
        F.coalesce(F.sum(F.col("d_c") * F.col("d_c")), zero).alias("s_dd"),
    )
    n_nodes = lab.agg(F.count(F.lit(1)).alias("n_nodes"))
    four = F.lit(4).cast(_DEC)
    q_num = four * F.col("m") * F.col("s_l") - F.col("s_dd")
    q_den = four * F.col("m") * F.col("m")
    return (
        sums.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("n_nodes"),
            F.col("m").cast("long").alias("n_edges"),
            F.col("n_communities"),
            F.col("s_l").cast("long").alias("intra_edges"),
            F.when(F.col("m") == 0, F.lit(0.0))
            .otherwise(
                F.round(q_num.cast("double") / q_den.cast("double"), 6)
            )
            .alias("modularity"),
        )
    )


def modularity_sql(edges_sql: str, labels_sql: str) -> str:
    """The IDENTICAL pinned arithmetic for DuckDB. ``edges_sql`` yields
    (src, dst); ``labels_sql`` yields (node, label) — pass T61's
    unrolled lpa_oracle_sql as a subquery to gate the composed chain."""
    return f"""
WITH canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), lab AS MATERIALIZED (
  SELECT node, label FROM ({labels_sql})
), degrees AS (
  SELECT node, count(*)::BIGINT AS d
  FROM (SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
  GROUP BY node
), d_c AS (
  SELECT lab.label,
         sum(CAST(coalesce(degrees.d, 0) AS HUGEINT)) AS d_c
  FROM lab LEFT JOIN degrees ON degrees.node = lab.node
  GROUP BY lab.label
), intra AS (
  SELECT la.label, count(*)::BIGINT AS l_c
  FROM canon
  JOIN lab la ON la.node = canon.a
  JOIN lab lb ON lb.node = canon.b
  WHERE la.label = lb.label
  GROUP BY la.label
), per_comm AS (
  SELECT d_c.label, d_c.d_c,
         CAST(coalesce(intra.l_c, 0) AS HUGEINT) AS l_c
  FROM d_c LEFT JOIN intra ON intra.label = d_c.label
), m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM canon),
sums AS (
  SELECT count(*)::BIGINT AS n_communities,
         coalesce(sum(l_c), CAST(0 AS HUGEINT)) AS s_l,
         coalesce(sum(d_c * d_c), CAST(0 AS HUGEINT)) AS s_dd
  FROM per_comm
), n AS (SELECT count(*)::BIGINT AS n_nodes FROM lab)
SELECT n.n_nodes,
  CAST(m.m AS BIGINT) AS n_edges,
  sums.n_communities,
  CAST(sums.s_l AS BIGINT) AS intra_edges,
  CASE WHEN m.m = 0 THEN 0.0
       ELSE round(
         CAST(CAST(4 AS HUGEINT) * m.m * sums.s_l - sums.s_dd AS DOUBLE)
         / CAST(CAST(4 AS HUGEINT) * m.m * m.m AS DOUBLE), 6)
  END AS modularity
FROM sums, m, n
"""

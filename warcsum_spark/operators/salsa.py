"""T111 — SALSA hubs & authorities (Lempel & Moran, WWW9 2000 / ACM
TOIT 19(2) 2001, "The stochastic approach for link-structure
analysis"; Najork WSDM 2007 showed it outperforming HITS and PageRank
as a ranking feature, which made it a production staple).

HITS (operators/hits.py) lets a tightly-knit community soak up all
the score (the TKC effect — Lempel & Moran §3.1); SALSA replaces the
mutual reinforcement with two random walks on the bipartite
hub/authority graph, which provably kills the effect. The punchline
that makes it a SPARK-NATIVE one-pass operator instead of an
iteration: Lempel & Moran prove the stationary distributions in
closed form —

    authority(j) = (|A_c| / |A|) * (indeg(j) / |E_c|)
    hub(i)       = (|H_c| / |H|) * (outdeg(i) / |E_c|)

where c is j's connected component of the (undirected) bipartite
hub-role/authority-role graph, A_c / H_c its authorities / hubs, and
|E_c| its edges (= the component's total in-degree = its total
out-degree). No power iteration, no convergence threshold, no
per-round rounding discipline — the scores are RATIOS OF EXACT
INTEGERS, and each output value is one pinned division rounded to
``round_scale``. Mass is conserved exactly: each side sums to 1.

Spark shape at 10^10 edges: one distinct over the edge list; two slim
degree aggregations; ONE connected-components run over the bipartite
encoding (node 2i = hub-role of i, node 2j+1 = authority-role of j —
no max-id scan needed), reusing operators/clusters.py's min-label
machinery; then broadcast one-row totals and dimension-sized
component tables back onto the degree rows. Everything shuffled is
(long, long); the CC loop is the only iteration and it is O(diameter)
with localCheckpoint lineage cuts (clusters.py discipline).

Roles are independent: a page with no outlinks has hub 0, a page with
no inlinks has authority 0, matching the paper's bipartite
construction (a node appears on a side only if it has the role).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.clusters import connected_components

_DEC = "decimal(38,0)"


def salsa(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    round_scale: int = 9,
    max_iter: int = 50,
) -> DataFrame:
    """(node, hub, authority) by the Lempel–Moran closed form.
    Duplicate edges collapse (the classic unweighted formulation);
    self-loops are legitimate (the page holds both roles). See module
    docstring."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # bipartite role encoding: hub-role(i) = 2i, authority-role(j) = 2j+1
    comp = connected_components(
        e.select(
            (F.col("src") * 2).alias("doc_a"),
            (F.col("dst") * 2 + 1).alias("doc_b"),
        ),
        max_iter=max_iter,
    )
    # integer div — a double intermediate would lose exactness past 2^53
    hub_comp = comp.filter(F.col("node") % 2 == 0).select(
        F.expr("node div 2").alias("node"),
        F.col("component").alias("c"),
    )
    auth_comp = comp.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("node"),
        F.col("component").alias("c"),
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    indeg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    def _side(deg: DataFrame, roles: DataFrame, out_col: str) -> DataFrame:
        """score = (n_side_c * deg) / (n_side_total * e_c) — exact
        integer numerator/denominator, one pinned division."""
        rows = deg.join(roles, "node")
        per_c = rows.groupBy("c").agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum("deg").alias("e_c"),  # component edge count
        )
        total = rows.agg(F.count(F.lit(1)).alias("n_total"))
        num = F.col("n_c").cast(_DEC) * F.col("deg").cast(_DEC)
        den = F.col("n_total").cast(_DEC) * F.col("e_c").cast(_DEC)
        return (
            rows.join(per_c, "c")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.round(
                    num.cast("double") / den.cast("double"), round_scale
                ).alias(out_col),
            )
        )

    hubs = _side(outdeg, hub_comp, "hub")
    auths = _side(indeg, auth_comp, "authority")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def salsa_sql(edges_sql: str, round_scale: int = 9) -> str:
    """The IDENTICAL closed form for DuckDB: bipartite components via
    a recursive CTE (the ORACLE_DEDUP_CLUSTERS reachability idiom),
    then the same exact-integer ratios. ``edges_sql`` yields
    (src, dst)."""
    return f"""
WITH RECURSIVE s_e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ({edges_sql})
), s_be AS MATERIALIZED (
  SELECT src * 2 AS a, dst * 2 + 1 AS b FROM s_e
), bedges AS MATERIALIZED (
  -- DISTINCT-over-UNION-ALL, not bare UNION: inside WITH RECURSIVE,
  -- DuckDB compiles any top-level-UNION CTE through the recursive
  -- path and the UNION's dedup is lost
  SELECT DISTINCT x, y FROM (
    SELECT a AS x, b AS y FROM s_be UNION ALL SELECT b, a FROM s_be)
), reach(node, lbl) AS (
  SELECT x, x FROM bedges
  UNION
  SELECT g.y, r.lbl FROM reach r JOIN bedges g ON g.x = r.node
), comp AS MATERIALIZED (
  SELECT node, min(lbl) AS c FROM reach GROUP BY node
), outdeg AS (
  SELECT src AS node, count(*)::BIGINT AS deg FROM s_e GROUP BY src
), indeg AS (
  SELECT dst AS node, count(*)::BIGINT AS deg FROM s_e GROUP BY dst
), hub_rows AS (
  SELECT outdeg.node, outdeg.deg, comp.c
  FROM outdeg JOIN comp ON comp.node = outdeg.node * 2
), auth_rows AS (
  SELECT indeg.node, indeg.deg, comp.c
  FROM indeg JOIN comp ON comp.node = indeg.node * 2 + 1
), hub_c AS (
  SELECT c, count(*)::BIGINT AS n_c,
         sum(CAST(deg AS HUGEINT)) AS e_c
  FROM hub_rows GROUP BY c
), auth_c AS (
  SELECT c, count(*)::BIGINT AS n_c,
         sum(CAST(deg AS HUGEINT)) AS e_c
  FROM auth_rows GROUP BY c
), hub_n AS (SELECT count(*)::BIGINT AS n_total FROM hub_rows),
auth_n AS (SELECT count(*)::BIGINT AS n_total FROM auth_rows),
hubs AS (
  SELECT r.node,
    round(CAST(CAST(hc.n_c AS HUGEINT) * r.deg AS DOUBLE)
          / CAST(CAST(hn.n_total AS HUGEINT) * hc.e_c AS DOUBLE),
          {int(round_scale)}) AS hub
  FROM hub_rows r JOIN hub_c hc USING (c) CROSS JOIN hub_n hn
), auths AS (
  SELECT r.node,
    round(CAST(CAST(ac.n_c AS HUGEINT) * r.deg AS DOUBLE)
          / CAST(CAST(an.n_total AS HUGEINT) * ac.e_c AS DOUBLE),
          {int(round_scale)}) AS authority
  FROM auth_rows r JOIN auth_c ac USING (c) CROSS JOIN auth_n an
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM s_e UNION ALL SELECT dst FROM s_e)
)
SELECT n.node,
  coalesce(h.hub, 0.0) AS hub,
  coalesce(a.authority, 0.0) AS authority
FROM nodes n
LEFT JOIN hubs h ON h.node = n.node
LEFT JOIN auths a ON a.node = n.node
"""

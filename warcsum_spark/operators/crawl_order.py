"""T122 — crawl-ordering evaluation (Cho, Garcia-Molina & Page,
"Efficient crawling through URL ordering", WWW 1998 — the paper that
made crawl ordering a measured problem: define an importance metric,
crawl under different orderings, and report what fraction of the HOT
pages (importance above a cutoff) has been fetched after k fetches.
Its headline result — backlink/PageRank-greedy ordering finds hot
pages far sooner than random or discovery order — is the argument
behind every priority frontier since, including R5's politeness
top-k and T100's OPIC).

This operator reproduces the paper's evaluation table over a link
graph: importance = in-degree (the paper's IB(p) metric), hot set =
top ``hot_pct``% by (in-degree, node) with the tie pinned, three
deterministic orderings —

* ``backlink``  — fetch in (in-degree DESC, node ASC) order, the
  paper's greedy IB ordering (its crawl & stop optimum);
* ``discovery`` — fetch in node-id order (synthetic ids are
  allocation order, the BFS-discovery stand-in, the paper's
  breadth-first row);
* ``random``    — fetch in md5(node) order (a uniform deterministic
  permutation, identical string ordering in both engines).

For each ordering and checkpoint c% the output row carries the
EXACT integers (n_nodes, k = ⌊n·c/100⌋ pages crawled, hot_total =
max(1, ⌊n·hot_pct/100⌋), hot_found) and recall = round(found/total,
6) — the one IEEE division. Crawled-set membership is the exact
integer test 100·(pos+1) ≤ n·c (never a float cutoff).

Plan shape at 100 TB: in-degree is ONE dst-keyed map-side-combinable
exchange; each ordering's dense rank uses the docid_remap
range-partition + offset discipline (url_sort_ids — never a global
single-partition window); the per-ordering aggregate is one scalar
row with conditional sums per checkpoint, unpivoted JVM-side. Only
(node, long) rows ever shuffle.

No reference counterpart (warcsum has no frontier); §2.12 crawl-
policy tier, sibling of T100/T108/R5.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.docid_remap import url_sort_ids

ORDERINGS = ("backlink", "discovery", "random")


def crawl_ordering_eval(
    edges: DataFrame,
    hot_pct: int = 10,
    checkpoints: tuple[int, ...] = (10, 25, 50, 100),
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(ordering, checkpoint_pct, n_nodes, crawled, hot_total,
    hot_found, recall) — the Cho/Garcia-Molina/Page hot-page recall
    curve for the three pinned orderings; see module docstring."""
    if not 1 <= hot_pct <= 100:
        raise ValueError(f"hot_pct must be in [1, 100], got {hot_pct}")
    if not checkpoints or any(not 1 <= c <= 100 for c in checkpoints):
        raise ValueError(f"checkpoints must lie in [1, 100]: {checkpoints}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    indeg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    nt = nodes.join(indeg, "node", "left").select(
        "node", F.coalesce("indeg", F.lit(0)).alias("indeg")
    ).localCheckpoint(eager=True)

    def _rank(key_col, name):
        keyed = nt.select("node", key_col.alias("_key"))
        return url_sort_ids(keyed, url_col="_key", id_col="node").select(
            F.col("old_id").alias("node"), F.col("new_id").alias(f"pos_{name}")
        )

    ranks = {
        "backlink": _rank(-F.col("indeg"), "backlink"),
        "discovery": _rank(F.col("node"), "discovery"),
        "random": _rank(F.md5(F.col("node").cast("string")), "random"),
    }
    # hot set = the first hot_total fetches of the backlink ordering;
    # checkpointed because all three ordering branches join it (and
    # the backlink branch would otherwise recompute its own rank)
    hot = ranks["backlink"].select(
        "node", F.col("pos_backlink").alias("_hot_rank")
    ).localCheckpoint(eager=True)
    n1 = nt.agg(F.count(F.lit(1)).alias("n_nodes"))
    per_ordering = []
    for name in ORDERINGS:
        t = (
            ranks[name]
            .join(hot, "node")
            .crossJoin(F.broadcast(n1))
        )
        n = F.col("n_nodes")
        hot_total = F.greatest(
            F.lit(1).cast("long"),
            F.floor(n * F.lit(int(hot_pct)) / F.lit(100)).cast("long"),
        )
        is_hot = F.col("_hot_rank") < hot_total
        pos = F.col(f"pos_{name}")
        aggs = [F.max(n).alias("n_nodes"), F.max(hot_total).alias("hot_total")]
        for c in checkpoints:
            crawled = (F.lit(100) * (pos + 1)) <= (n * F.lit(int(c)))
            aggs.append(
                F.sum(crawled.cast("long")).alias(f"crawled_{c}")
            )
            aggs.append(
                F.sum((crawled & is_hot).cast("long")).alias(f"found_{c}")
            )
        row = t.agg(*aggs)
        stack = ", ".join(
            f"{int(c)}, crawled_{c}, found_{c}" for c in checkpoints
        )
        per_ordering.append(
            row.select(
                F.lit(name).alias("ordering"),
                "n_nodes",
                "hot_total",
                F.expr(
                    f"stack({len(checkpoints)}, {stack}) "
                    "AS (checkpoint_pct, crawled, hot_found)"
                ),
            )
        )
    out = reduce(lambda a, b: a.unionByName(b), per_ordering)
    return out.select(
        "ordering",
        F.col("checkpoint_pct").cast("long").alias("checkpoint_pct"),
        "n_nodes",
        "crawled",
        "hot_total",
        "hot_found",
        F.round(
            F.col("hot_found").cast("double")
            / F.col("hot_total").cast("double"),
            6,
        ).alias("recall"),
    )


def crawl_ordering_oracle_sql(
    edges_cte: str,
    hot_pct: int = 10,
    checkpoints: tuple[int, ...] = (10, 25, 50, 100),
) -> str:
    """The identical evaluation in DuckDB: plain global window ranks
    (the oracle may use the single-partition form the engine
    refuses), the same exact-integer crawled test, the same pinned
    tie-breaks."""
    cps = ", ".join(f"({int(c)})" for c in checkpoints)
    return f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({edges_cte})),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
indeg AS (
  SELECT nodes.node, count(e.dst) AS indeg
  FROM nodes LEFT JOIN e ON e.dst = nodes.node GROUP BY nodes.node
),
ranked AS (
  SELECT node, indeg,
         row_number() OVER (ORDER BY -indeg, node) - 1 AS pos_backlink,
         row_number() OVER (ORDER BY node) - 1 AS pos_discovery,
         row_number() OVER (ORDER BY md5(CAST(node AS VARCHAR)), node) - 1
           AS pos_random
  FROM indeg
),
n AS (SELECT count(*)::BIGINT AS n_nodes FROM ranked),
h AS (
  SELECT greatest(1, CAST(floor(n_nodes * {int(hot_pct)} / 100)
                          AS BIGINT)) AS hot_total, n_nodes FROM n
),
cp AS (SELECT * FROM (VALUES {cps}) AS t(checkpoint_pct)),
orderings AS (
  SELECT 'backlink' AS ordering, node, pos_backlink AS pos,
         pos_backlink AS hot_rank FROM ranked
  UNION ALL
  SELECT 'discovery', node, pos_discovery, pos_backlink FROM ranked
  UNION ALL
  SELECT 'random', node, pos_random, pos_backlink FROM ranked
)
SELECT o.ordering, CAST(cp.checkpoint_pct AS BIGINT) AS checkpoint_pct,
       h.n_nodes,
       sum(CASE WHEN 100 * (o.pos + 1) <= h.n_nodes * cp.checkpoint_pct
                THEN 1 ELSE 0 END)::BIGINT AS crawled,
       h.hot_total,
       sum(CASE WHEN 100 * (o.pos + 1) <= h.n_nodes * cp.checkpoint_pct
                 AND o.hot_rank < h.hot_total
                THEN 1 ELSE 0 END)::BIGINT AS hot_found,
       round(sum(CASE WHEN 100 * (o.pos + 1)
                           <= h.n_nodes * cp.checkpoint_pct
                       AND o.hot_rank < h.hot_total
                      THEN 1 ELSE 0 END)
             / CAST(h.hot_total AS DOUBLE), 6) AS recall
FROM orderings o, h, cp
GROUP BY o.ordering, cp.checkpoint_pct, h.n_nodes, h.hot_total
"""

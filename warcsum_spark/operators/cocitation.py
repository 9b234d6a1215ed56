"""T99 — co-citation similarity / related pages (Small, JASIS 1973 for
co-citation; Kessler 1963 for the bibliographic-coupling dual; Dean &
Henzinger WWW 1999 for the webgraph "related pages" application this
implements: two pages are related when many pages link to BOTH).

Why a crawl engine wants it: co-citation is the link-graph similarity
that needs no content — the classic "related sites" primitive, a seed
expander ("find more like these trusted seeds" — feeds T79's seed
set), and a mirror/alias detector complementing T45's URL-rule mining
(mirrors are co-cited by the same referrers even when their URLs share
nothing). T65 counts triangles AROUND a node; this scores PAIRS.

Pinned, engine-portable semantics:

* input edges (src, dst), deduplicated internally to simple edges
  (co-citation counts REFERRERS, not link multiplicity — pinned);
* a referrer r contributes to pair (a, b), a < b, when r → a and
  r → b; ``common(a,b)`` = number of such referrers;
* referrers with out-degree > ``max_fanout`` are DROPPED before
  pairing (the Dean–Henzinger mitigation: a directory page linking
  10^5 sites asserts nothing about relatedness and would alone mint
  10^10 pairs — the same hub discipline as T65's degree cap). Their
  removal is part of the operator's DEFINITION here, so the oracle
  applies the identical cap;
* in-degrees for the Jaccard denominator are counted over the SAME
  capped referrer set (self-consistency — pinned):
  ``jaccard = common / (indeg(a) + indeg(b) − common)`` — exact
  integers, ONE IEEE division, rounded to 6;
* output pairs with ``common ≥ min_common``.

Plan shape at 100 TB: dedupe + degree filter are one map-side-
combined agg + one slim semi-join; pairing is the single self-join of
the capped edge list on the referrer key — each referrer with
out-degree d ≤ max_fanout emits d(d−1)/2 ordered pairs, so the
blow-up is bounded by construction (max_fanout² per referrer), the
standard sub-quadratic shape for this operator; then ONE pair-grain
exchange with map-side combine. No windows, no collects, no Python.

No reference counterpart; the measure is the published one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cocitation(
    edges: DataFrame,
    min_common: int = 2,
    max_fanout: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, common, indeg_a, indeg_b, jaccard) with a < b — see
    module docstring for the pinned semantics."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_d"))
    capped = e.join(
        deg.filter(F.col("_d") <= max_fanout).select("src"), "src", "left_semi"
    )
    indeg = capped.groupBy("dst").agg(F.count("*").alias("indeg"))
    left = capped.select("src", F.col("dst").alias("a"))
    right = capped.select("src", F.col("dst").alias("b"))
    pairs = (
        left.join(right, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    out = (
        pairs.join(
            indeg.select(F.col("dst").alias("a"), F.col("indeg").alias("indeg_a")),
            "a",
        )
        .join(
            indeg.select(F.col("dst").alias("b"), F.col("indeg").alias("indeg_b")),
            "b",
        )
    )
    union = F.col("indeg_a") + F.col("indeg_b") - F.col("common")
    return out.select(
        "a",
        "b",
        "common",
        "indeg_a",
        "indeg_b",
        F.round(
            F.col("common").cast("double") / union.cast("double"), 6
        ).alias("jaccard"),
    )


def cocitation_sql(
    edges_sql: str,
    min_common: int = 2,
    max_fanout: int = 64,
) -> str:
    """The IDENTICAL pinned semantics for DuckDB over ``edges_sql``
    (a SELECT producing (src, dst))."""
    return f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
deg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
capped AS (
  SELECT e.src, e.dst FROM e JOIN deg USING (src)
  WHERE deg.d <= {max_fanout}
),
indeg AS (SELECT dst, count(*)::BIGINT AS indeg FROM capped GROUP BY dst),
pairs AS (
  SELECT l.dst AS a, r.dst AS b, count(*)::BIGINT AS common
  FROM capped l JOIN capped r ON l.src = r.src AND l.dst < r.dst
  GROUP BY l.dst, r.dst
  HAVING count(*) >= {min_common}
)
SELECT p.a, p.b, p.common, ia.indeg AS indeg_a, ib.indeg AS indeg_b,
  round(CAST(p.common AS DOUBLE)
        / CAST(ia.indeg + ib.indeg - p.common AS DOUBLE), 6) AS jaccard
FROM pairs p
JOIN indeg ia ON p.a = ia.dst
JOIN indeg ib ON p.b = ib.dst
"""

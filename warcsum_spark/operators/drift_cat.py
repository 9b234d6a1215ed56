"""T102 — categorical drift between crawl snapshots: Pearson's
chi-square homogeneity test over a category column (Pearson 1900; the
two-sample homogeneity form in every statistics text), per-category
contributions plus the whole-table statistic.

Why the engine wants it: T68 measures drift in EMBEDDING space and T56
diffs individual documents; neither answers "did the language / domain
/ MIME mix of this week's crawl shift, and which categories moved".
That categorical composition question is the first dashboard panel of
every recurring-crawl operation, and the chi-square contribution per
category is the standard "who moved" attribution. Mixture recipes
(T20) gate on exactly this before re-weighting.

Pinned, engine-portable arithmetic — fully exact until one division
per output value (a step past the usual float chi-square):

* counts ``a_i``/``b_i`` per category, totals ``n_a``/``n_b``,
  ``t_i = a_i + b_i``, ``N = n_a + n_b`` — all integers;
* the contribution of side A for category i,
  ``(a_i − n_a·t_i/N)² / (n_a·t_i/N)``, is evaluated as the exact
  rational ``(a_i·N − n_a·t_i)² / (n_a·t_i·N)`` — numerator and
  denominator accumulated in DECIMAL(38,0)/HUGEINT, ONE IEEE division,
  rounded to 6 (same for side B with ``n_b``);
* ``chi2`` (the whole-table statistic, same value on every row) is the
  sum of the ROUNDED contributions, summed exactly as 1e6-scaled
  integers (the zipf.py associativity discipline) — so even the total
  is partitioning-proof; ``dof = k − 1``;
* share columns ``share_a``/``share_b`` = one pinned division each.

Plan shape at 100 TB: each corpus is ONE map-side-combined count
aggregation; everything after runs on the k-row category table with
one-row broadcast totals. No windows, no Python, corpora never meet
row-wise.

No reference counterpart; the test is the published one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def categorical_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    cat_col: str = "lang",
) -> DataFrame:
    """One row per category: (category, n_a, n_b, share_a, share_b,
    contrib_a, contrib_b, chi2, dof). See module docstring for the
    exact-rational arithmetic. Categories absent from one side count 0
    there (a full outer join — new/vanished categories are exactly the
    drift signal)."""
    ca = corpus_a.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("a")
    )
    cb = corpus_b.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("b")
    )
    cats = (
        ca.join(cb, "category", "full_outer")
        .select(
            "category",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    totals = cats.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cats.crossJoin(F.broadcast(totals))
    na = F.col("n_a").cast(_DEC)
    nb = F.col("n_b").cast(_DEC)
    a = F.col("a").cast(_DEC)
    b = F.col("b").cast(_DEC)
    t = a + b
    n = na + nb

    def contrib(side, n_side):
        num = (side * n) - (n_side * t)
        return F.when(
            t > 0,
            F.round(
                (num * num).cast("double") / (n_side * t * n).cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    scored = j.select(
        "category",
        F.col("a").alias("n_a_cat"),
        F.col("b").alias("n_b_cat"),
        F.col("n_a"),
        F.col("n_b"),
        F.col("k"),
        F.round(a.cast("double") / na.cast("double"), 6).alias("share_a"),
        F.round(b.cast("double") / nb.cast("double"), 6).alias("share_b"),
        contrib(a, na).alias("contrib_a"),
        contrib(b, nb).alias("contrib_b"),
    ).localCheckpoint(eager=False)
    # total of the ROUNDED contributions as exact 1e6-scaled integers —
    # associative, partitioning-proof
    chi = scored.agg(
        (
            F.sum(F.round(F.col("contrib_a") * 1e6).cast(_DEC))
            + F.sum(F.round(F.col("contrib_b") * 1e6).cast(_DEC))
        ).alias("_s")
    ).select(
        (F.col("_s").cast("double") / F.lit(1e6)).alias("chi2")
    )
    return scored.crossJoin(F.broadcast(chi)).select(
        "category",
        F.col("n_a_cat").alias("n_a"),
        F.col("n_b_cat").alias("n_b"),
        "share_a",
        "share_b",
        "contrib_a",
        "contrib_b",
        F.round("chi2", 6).alias("chi2"),
        (F.col("k") - 1).cast("long").alias("dof"),
    )


def categorical_drift_sql(
    corpus_a_sql: str,
    corpus_b_sql: str,
    cat_col: str = "lang",
) -> str:
    """The IDENTICAL exact-rational arithmetic for DuckDB;
    ``corpus_X_sql`` selects rows carrying ``cat_col``."""
    c = (
        "CASE WHEN t > 0 THEN round(CAST(({s} * n - {ns} * t)"
        " * ({s} * n - {ns} * t) AS DOUBLE)"
        " / CAST({ns} * t * n AS DOUBLE), 6) ELSE 0.0 END"
    )
    return f"""
WITH ca AS (
  SELECT {cat_col} AS category, count(*)::BIGINT AS a
  FROM ({corpus_a_sql}) GROUP BY {cat_col}
), cb AS (
  SELECT {cat_col} AS category, count(*)::BIGINT AS b
  FROM ({corpus_b_sql}) GROUP BY {cat_col}
), cats AS (
  SELECT category, coalesce(a, 0) AS a, coalesce(b, 0) AS b
  FROM ca FULL OUTER JOIN cb USING (category)
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         count(*)::BIGINT AS k
  FROM cats
), scored AS (
  SELECT category, cats.a, cats.b, n_a, n_b, k,
    round(CAST(cats.a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS share_a,
    round(CAST(cats.b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS share_b,
    {c.format(s='CAST(cats.a AS HUGEINT)', ns='CAST(n_a AS HUGEINT)')}
      AS contrib_a,
    {c.format(s='CAST(cats.b AS HUGEINT)', ns='CAST(n_b AS HUGEINT)')}
      AS contrib_b
  FROM cats CROSS JOIN tot,
       LATERAL (SELECT CAST(cats.a + cats.b AS HUGEINT) AS t,
                       CAST(n_a + n_b AS HUGEINT) AS n) x
), chi AS (
  SELECT CAST(sum(CAST(round(contrib_a * 1e6) AS HUGEINT))
              + sum(CAST(round(contrib_b * 1e6) AS HUGEINT)) AS DOUBLE)
         / 1e6 AS chi2
  FROM scored
)
SELECT category, a AS n_a, b AS n_b, share_a, share_b,
       contrib_a, contrib_b, round(chi2, 6) AS chi2,
       CAST(k - 1 AS BIGINT) AS dof
FROM scored CROSS JOIN chi
"""

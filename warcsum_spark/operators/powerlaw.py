"""T117 — power-law tail fit for degree distributions (Clauset,
Shalizi & Newman, SIAM Review 2009): the discrete MLE for the exponent
plus the Kolmogorov–Smirnov distance of the fit.

Why a crawl engine wants it: web in-degree is the canonical power law
(α ≈ 2.1 in the classic AltaVista measurements); the fitted exponent
and its KS distance are whole-graph smoke alarms the same way T90's
Zipf slope is for text — link farms fatten the tail (α drops, KS
blows up on the head), crawler traps mint unbounded low-degree mass,
and a frontier that suddenly fits α ≈ 1.5 is telling you its priority
queue is about to be dominated by a handful of hubs (plan T36 budgets
accordingly).

Pinned, engine-portable definitions (continuous approximation at
half-integers, the paper's eq. 3.7 and §3.3.2):

* tail sample: values d ≥ xmin (integer degrees);
* MLE:  α̂ = 1 + n / Σ_i ln(d_i / (xmin − ½));
* std error:  σ = (α̂ − 1) / √n;
* KS: model CDF P(d) = 1 − ((d + ½)/(xmin − ½))^(1−α̂) compared with
  the empirical CDF at every observed distinct value (both are step
  functions jumping at integers, so observed values are the only
  evaluation points a discrete KS needs) — D = max_d |S(d) − P(d)|.

Float discipline is T90's verbatim: each per-row ln is scaled by 1e8
and rounded to an exact integer, the cross-row sum runs in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — associative, so any
partition order yields the same integers — and α̂/σ/KS are fixed IEEE
expressions over those integers. The KS cumulative runs over the
DISTINCT-degree histogram (dimension-sized: thousands of distinct
degrees for 10^10 nodes), so its single-partition window is a
deliberate, bounded choice, not a global sort of the data.

Plan shape at 100 TB: one dst-keyed exchange for the degree count, one
map-side-combinable groupBy(degree) to the histogram, scalar
aggregates + one-row broadcasts after that. No collect, no Python.

No reference counterpart (warcsum has no graph stage); §2.12 graph
diagnostics, sibling of T90/T95/T97.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 100_000_000  # 1e8, the T90 scaled-ln contract

_DEC = "decimal(38,0)"


def powerlaw_fit(
    values: DataFrame,
    value_col: str = "value",
    xmin: int = 1,
) -> DataFrame:
    """One row (n_tail, xmin, alpha, sigma, ks_stat) — the discrete
    power-law MLE over ``values.value_col`` ≥ ``xmin`` with the KS
    distance of the fit; NULL fit columns when the tail has < 2
    points. Values must be positive integers."""
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    half = float(xmin) - 0.5
    d = F.col("_d").cast("double")
    tail = values.select(
        F.col(value_col).cast("long").alias("_d")
    ).filter(F.col("_d") >= xmin)

    scaled_ln = F.round(F.log(d / F.lit(half)) * SCALE).cast(_DEC)
    sums = tail.agg(
        F.count("*").alias("_n"),
        F.coalesce(F.sum(scaled_ln), F.lit(0).cast(_DEC)).alias("_s"),
    )
    alpha = F.lit(1.0) + F.col("_n").cast("double") / (
        F.col("_s").cast("double") / F.lit(float(SCALE))
    )
    fit = sums.select(
        "_n",
        F.when(F.col("_n") >= 2, alpha).alias("_alpha"),
    ).select(
        "_n",
        "_alpha",
        F.when(
            F.col("_alpha").isNotNull(),
            (F.col("_alpha") - F.lit(1.0))
            / F.sqrt(F.col("_n").cast("double")),
        ).alias("_sigma"),
    )

    # KS over the distinct-degree histogram (dimension-sized)
    hist = tail.groupBy("_d").agg(F.count("*").alias("_c"))
    w = Window.orderBy("_d").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    ks_terms = cum.crossJoin(F.broadcast(fit)).select(
        F.when(
            F.col("_alpha").isNotNull(),
            F.abs(
                F.col("_cum").cast("double") / F.col("_n").cast("double")
                - (
                    F.lit(1.0)
                    - F.pow(
                        (F.col("_d").cast("double") + F.lit(0.5))
                        / F.lit(half),
                        F.lit(1.0) - F.col("_alpha"),
                    )
                )
            ),
        ).alias("_t")
    )
    ks = ks_terms.agg(F.max("_t").alias("_ks"))

    return fit.crossJoin(F.broadcast(ks)).select(
        F.col("_n").alias("n_tail"),
        F.lit(xmin).cast("long").alias("xmin"),
        F.round("_alpha", 6).alias("alpha"),
        F.round("_sigma", 6).alias("sigma"),
        F.round("_ks", 6).alias("ks_stat"),
    )


def indegree_powerlaw(
    edges: DataFrame,
    xmin: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-law fit of the link graph's in-degree distribution —
    duplicate edges collapse first (structural in-degree, matching
    T32's adjacency semantics)."""
    deg = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .groupBy("dst")
        .agg(F.count("*").alias("indeg"))
    )
    return powerlaw_fit(deg, "indeg", xmin)


def powerlaw_sql(
    values_cte: str,
    value_col: str = "value",
    xmin: int = 1,
) -> str:
    """DuckDB twin of ``powerlaw_fit`` — identical scaled-integer sum,
    MLE/σ/KS expressions, and round-6 output. ``values_cte`` yields
    ``value_col``."""
    half = float(xmin) - 0.5
    p_hi = f"(1.0 - pow((d + 0.5) / {half!r}, 1.0 - f.alpha))"
    return f"""
WITH tail AS (
  SELECT CAST({value_col} AS BIGINT) AS d FROM ({values_cte})
  WHERE {value_col} >= {xmin}
), sums AS (
  SELECT count(*) AS n,
         coalesce(sum(CAST(round(ln(CAST(d AS DOUBLE) / {half!r})
                                 * {SCALE}) AS HUGEINT)),
                  0) AS s
  FROM tail
), fit AS (
  SELECT n,
         CASE WHEN n >= 2 THEN
           1.0 + CAST(n AS DOUBLE) / (CAST(s AS DOUBLE) / {float(SCALE)!r})
         END AS alpha
  FROM sums
), fit2 AS (
  SELECT n, alpha,
         CASE WHEN alpha IS NOT NULL THEN
           (alpha - 1.0) / sqrt(CAST(n AS DOUBLE))
         END AS sigma
  FROM fit
), hist AS (
  SELECT d, count(*) AS c FROM tail GROUP BY d
), cum AS (
  SELECT d, c, sum(c) OVER (ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM hist
), ks AS (
  SELECT max(CASE WHEN f.alpha IS NOT NULL THEN
    abs(CAST(cm AS DOUBLE) / CAST(f.n AS DOUBLE) - {p_hi})
    END) AS ksd
  FROM cum, fit2 f
)
SELECT f.n AS n_tail,
       CAST({xmin} AS BIGINT) AS xmin,
       round(f.alpha, 6) AS alpha,
       round(f.sigma, 6) AS sigma,
       round(ks.ksd, 6) AS ks_stat
FROM fit2 f, ks
"""


def indegree_powerlaw_sql(edges_cte: str, xmin: int = 1) -> str:
    return powerlaw_sql(
        f"SELECT count(*) AS indeg FROM "
        f"(SELECT DISTINCT src, dst FROM ({edges_cte})) GROUP BY dst",
        "indeg",
        xmin,
    )

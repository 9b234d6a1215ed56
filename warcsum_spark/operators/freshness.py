"""T108 — expected freshness / age of the local copy under a revisit
policy (Cho & Garcia-Molina, "Synchronizing a database to improve
freshness", SIGMOD 2000; "Effective page refresh policies for web
crawlers", ACM TODS 28(4) 2003).

T35 decides WHICH pages are due and T96 estimates each page's Poisson
change rate; this operator closes the loop by scoring a whole revisit
POLICY before the crawler spends a single fetch on it: given per-page
rates lambda and a fetch budget of B pages/day, what average freshness
and average copy-age does a policy deliver? The paper's famous and
counter-intuitive theorem — uniform revisit beats
proportional-to-change-rate revisit for average freshness (TODS 2003
Thm 4.1) — is exactly the comparison this emits, and the pytest suite
pins it on heterogeneous rates.

Model (the paper's): page changes are Poisson(lambda); a page revisited
every I days has, in steady state,

    r = lambda * I
    freshness F(r)  = (1 - e^-r) / r                 (time-avg P[fresh])
    age/I    A(r)/I = 1/2 - 1/r + (1 - e^-r) / r^2   (time-avg staleness)

both derived by integrating P[fresh at t] = e^-lambda*t and
E[age at t] = t - (1 - e^-lambda*t)/lambda over one revisit interval
(the pytest twin re-derives them by numeric integration).

Policies scored, for n pages and budget B fetches/day:

* ``uniform``:      every page gets I = n / B;
* ``proportional``: page i gets f_i = B*lambda_i/sum(lambda), i.e.
  I_i = sum(lambda) / (B * lambda_i) — so r_i is the SAME for every
  page, the algebraic identity that drives the theorem.

Engine-portable arithmetic: lambda is T96's round-6 output; the
per-page sum(lambda) and the freshness/age corpus sums are
DECIMAL(38,6) EXACT accumulations of round-6 values (order- and
partitioning-independent — never a float sum across the corpus); the
IEEE work is the per-row closed form, identical expression tree in
both engines, rounded to 6 per row before the exact sum. For r < 0.01
both engines switch to the shared cubic Taylor branch (F: 1 - r/2 +
r^2/6 - r^3/24; A/I: r/6 - r^2/24 + r^3/120): the direct form's
(1 - e^-r) cancellation would otherwise amplify a 1-ulp cross-engine
exp() difference past the round-6 guarantee. Pages with
lambda <= 0 or NULL (T96's "never observed changing" / "no
information") are pinned F = 1, A = 0 and carry no proportional
budget — the optimal treatment of a static page.

Plan shape at 100 TB: the rate table is one slim row per URL (T96's
output, already url-partitioned); the policy table is TWO rows per
URL (a row-local explode), one scalar aggregate per strategy ends the
plan. The two one-row totals (n, sum lambda) are broadcast — the
audited normalizer crossJoin pattern, never a data x data product.

No reference counterpart; the model and theorem are the published
ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D6 = "decimal(38,6)"


def _fresh_age(r, i):
    """(freshness, age) column pair from r = lambda*I and interval I —
    the shared closed form with the r < 0.01 Taylor branch. Caller
    guarantees r > 0."""
    direct_f = (F.lit(1.0) - F.exp(-r)) / r
    direct_a = i * (
        F.lit(0.5) - F.lit(1.0) / r + (F.lit(1.0) - F.exp(-r)) / (r * r)
    )
    series_f = (
        F.lit(1.0) - r / F.lit(2.0) + r * r / F.lit(6.0)
        - r * r * r / F.lit(24.0)
    )
    series_a = i * (
        r / F.lit(6.0) - r * r / F.lit(24.0) + r * r * r / F.lit(120.0)
    )
    small = r < F.lit(0.01)
    return (
        F.when(small, series_f).otherwise(direct_f),
        F.when(small, series_a).otherwise(direct_a),
    )


def freshness_policy(
    rates: DataFrame,
    budget_per_day: float,
    lambda_col: str = "lambda_per_day",
) -> DataFrame:
    """TWO rows — (strategy, n_pages, n_changing, budget_per_day,
    avg_freshness, avg_age_days) for the ``uniform`` and
    ``proportional`` revisit policies. See module docstring."""
    lam = F.coalesce(F.col(lambda_col), F.lit(0.0))
    pages = rates.select(
        F.when(lam > 0, lam).otherwise(F.lit(0.0)).alias("lam")
    )
    totals = pages.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.when(F.col("lam") > 0, 1).otherwise(0)).alias("n_changing"),
        F.coalesce(
            F.sum(F.col("lam").cast(_D6)), F.lit(0).cast(_D6)
        ).alias("s_lambda"),
    )
    b = F.lit(float(budget_per_day))
    # per-page, per-strategy intervals (days); NULL interval for a
    # static page under proportional = "no budget spent", pinned below
    i_uni = F.col("n_pages").cast("double") / b
    i_prop = F.when(
        F.col("lam") > 0,
        F.col("s_lambda").cast("double") / b / F.col("lam"),
    )
    long = (
        pages.crossJoin(F.broadcast(totals))
        .withColumn(
            "strategy",
            F.explode(F.array(F.lit("uniform"), F.lit("proportional"))),
        )
        .select(
            "lam",
            "n_pages",
            "n_changing",
            "strategy",
            F.when(F.col("strategy") == "uniform", i_uni)
            .otherwise(i_prop)
            .alias("interval"),
        )
    )
    r = F.col("lam") * F.col("interval")
    fr, age = _fresh_age(r, F.col("interval"))
    scored = long.select(
        "strategy",
        "n_pages",
        "n_changing",
        F.when(F.col("lam") <= 0, F.lit(1.0))
        .otherwise(F.round(fr, 6))
        .cast(_D6)
        .alias("f"),
        F.when(F.col("lam") <= 0, F.lit(0.0))
        .otherwise(F.round(age, 6))
        .cast(_D6)
        .alias("a"),
    )
    return (
        scored.groupBy("strategy")
        .agg(
            F.first("n_pages").alias("n_pages"),
            F.first("n_changing").alias("n_changing"),
            F.sum("f").alias("s_f"),
            F.sum("a").alias("s_a"),
        )
        .select(
            "strategy",
            "n_pages",
            F.col("n_changing").cast("long").alias("n_changing"),
            b.alias("budget_per_day"),
            F.round(
                F.col("s_f").cast("double") / F.col("n_pages").cast("double"),
                6,
            ).alias("avg_freshness"),
            F.round(
                F.col("s_a").cast("double") / F.col("n_pages").cast("double"),
                6,
            ).alias("avg_age_days"),
        )
    )


def freshness_policy_sql(
    rates_sql: str,
    budget_per_day: float,
    lambda_col: str = "lambda_per_day",
) -> str:
    """The IDENTICAL pinned model for DuckDB; ``rates_sql`` yields one
    row per page carrying ``lambda_col`` (T96's change_rate_sql slots
    straight in as a subquery)."""
    b = repr(float(budget_per_day))
    # the same expression trees as the engine, written over r = (lam*i)
    r = "(lam*i)"
    fr = f"(1.0 - exp(-{r})) / {r}"
    ag = f"i * (0.5 - 1.0/{r} + (1.0 - exp(-{r})) / ({r}*{r}))"
    sfr = f"1.0 - {r}/2.0 + {r}*{r}/6.0 - {r}*{r}*{r}/24.0"
    sag = f"i * ({r}/6.0 - {r}*{r}/24.0 + {r}*{r}*{r}/120.0)"
    return f"""
WITH pages AS (
  SELECT CASE WHEN coalesce({lambda_col}, 0.0) > 0
              THEN coalesce({lambda_col}, 0.0) ELSE 0.0 END AS lam
  FROM ({rates_sql})
), totals AS (
  SELECT count(*)::BIGINT AS n_pages,
         sum(CASE WHEN lam > 0 THEN 1 ELSE 0 END)::BIGINT AS n_changing,
         coalesce(sum(CAST(lam AS DECIMAL(38,6))),
                  CAST(0 AS DECIMAL(38,6))) AS s_lambda
  FROM pages
), long AS (
  SELECT lam, n_pages, n_changing, strategy,
    CASE WHEN strategy = 'uniform'
         THEN CAST(n_pages AS DOUBLE) / {b}
         WHEN lam > 0
         THEN CAST(s_lambda AS DOUBLE) / {b} / lam
    END AS i
  FROM pages, totals,
       (SELECT 'uniform' AS strategy UNION ALL SELECT 'proportional')
), scored AS (
  SELECT strategy, n_pages, n_changing,
    CASE WHEN lam <= 0 THEN CAST(1.0 AS DECIMAL(38,6))
         WHEN (lam*i) < 0.01 THEN CAST(round({sfr}, 6) AS DECIMAL(38,6))
         ELSE CAST(round({fr}, 6) AS DECIMAL(38,6))
    END AS f,
    CASE WHEN lam <= 0 THEN CAST(0.0 AS DECIMAL(38,6))
         WHEN (lam*i) < 0.01 THEN CAST(round({sag}, 6) AS DECIMAL(38,6))
         ELSE CAST(round({ag}, 6) AS DECIMAL(38,6))
    END AS a
  FROM long
)
SELECT strategy,
  max(n_pages) AS n_pages,
  max(n_changing) AS n_changing,
  CAST({b} AS DOUBLE) AS budget_per_day,
  round(CAST(sum(f) AS DOUBLE) / CAST(max(n_pages) AS DOUBLE), 6)
    AS avg_freshness,
  round(CAST(sum(a) AS DOUBLE) / CAST(max(n_pages) AS DOUBLE), 6)
    AS avg_age_days
FROM scored
GROUP BY strategy
"""

"""T35 — recrawl (freshness) scheduling: a steady-state crawler spends
most of its budget RE-fetching; which URLs are due is a function of
each page's observed change rate (Cho & Garcia-Molina, "Estimating
frequency of change", ACM TOIT 2003 — the classic result that uniform
revisit wastes budget on static pages and misses hot ones).

Estimator (deterministic, engine-portable):

* a *change* is a fetch whose payload digest differs from the previous
  fetch's digest for the same URL (lag window ordered by
  (ts, tiebreak) — the explicit tiebreak matters: same-timestamp rows
  would otherwise order differently per engine/partitioning and flip
  the change count);
* ``interval = span / changes`` (observed seconds per change), clamped
  to [min_interval, max_interval]; never-changed or single-fetch URLs
  take ``max_interval`` (nothing observed → slowest lane);
* ``next_due = last_fetch + interval``; the due set is
  ``next_due <= now``, with ``now`` an explicit parameter — scheduling
  must be reproducible, so wall-clock never leaks in.

Plan shape: ONE hash exchange on url serves both the lag window and
the aggregation (same key); output is one slim row per URL. At 10^10
URLs this is the same partitioning the frontier already uses, so the
due set feeds ``frontier_round`` without a re-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    history: DataFrame,
    now: str,
    min_interval_sec: int = 3600,
    max_interval_sec: int = 30 * 24 * 3600,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(url, last_ts, n_fetches, n_changes, interval_sec, next_due, due)
    from a fetch history. ``now`` is an ISO timestamp string (explicit,
    never wall-clock)."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(url_col).orderBy(*order)
    changed = (
        F.lag(digest_col).over(w).isNotNull()
        & (F.col(digest_col) != F.lag(digest_col).over(w))
    ).cast("long")
    agg = (
        history.withColumn("_chg", changed)
        .groupBy(url_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("_chg").alias("n_changes"),
            F.max(ts_col).alias("last_ts"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("_span"),
        )
    )
    interval = F.when(
        F.col("n_changes") > 0,
        F.least(
            F.greatest(
                (F.col("_span") / F.col("n_changes")).cast("long"),
                F.lit(min_interval_sec),
            ),
            F.lit(max_interval_sec),
        ),
    ).otherwise(F.lit(max_interval_sec))
    out = agg.select(
        url_col,
        "last_ts",
        "n_fetches",
        "n_changes",
        interval.alias("interval_sec"),
    ).withColumn(
        "next_due",
        F.timestamp_seconds(
            F.unix_timestamp("last_ts") + F.col("interval_sec")
        ),
    )
    return out.withColumn(
        "due", F.col("next_due") <= F.to_timestamp(F.lit(now))
    )


def change_rate_mle(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """T96 — the bias-corrected Poisson change-rate estimator of Cho &
    Garcia-Molina ("Estimating frequency of change", ACM TOIT 2003,
    §4.2): ``recrawl_schedule`` above uses the naive span/changes
    interval; the paper's point is that the naive ratio UNDERESTIMATES
    the rate (several changes between two visits collapse into one
    observed change), and its corrected estimator

        lambda_hat = -ln( (n - X + 0.5) / (n + 0.5) ) / I

    (n comparisons, X observed changes, I the mean inter-access
    interval) is consistent and stays finite even at X = n — the
    always-changed case where the naive MLE diverges.

    Output per URL: (url, n_obs, n_changes, avg_interval_sec,
    lambda_per_day, change_interval_sec) with

    * ``n_obs = fetches - 1`` (adjacent-pair comparisons; the same lag
      window + explicit tiebreak as recrawl_schedule, so the change
      count is engine/partitioning-deterministic);
    * ``avg_interval_sec = span / n_obs`` — one pinned IEEE division;
    * ``lambda_per_day = -ln((n-X+0.5)/(n+0.5)) / I * 86400`` — the
      pinned single-association chain, rounded to 6;
    * ``change_interval_sec = I / -ln(...)`` (the expected seconds
      between changes, 1/lambda) — rounded to 3; NULL when X = 0
      (nothing observed changes → no finite expectation is claimed;
      the SCHEDULING fallback lives in recrawl_schedule's
      max_interval clamp, not in the estimator);
    * single-fetch or zero-span URLs → NULL estimates (no information).

    Same plan shape as recrawl_schedule: the ONE url-keyed exchange
    serves the lag window and the aggregation; one slim row per URL
    out.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(url_col).orderBy(*order)
    changed = (
        F.lag(digest_col).over(w).isNotNull()
        & (F.col(digest_col) != F.lag(digest_col).over(w))
    ).cast("long")
    agg = (
        history.withColumn("_chg", changed)
        .groupBy(url_col)
        .agg(
            (F.count("*") - 1).alias("n_obs"),
            F.sum("_chg").alias("n_changes"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("_span"),
        )
    )
    n = F.col("n_obs").cast("double")
    x = F.col("n_changes").cast("double")
    iv = F.col("_span").cast("double") / F.col("n_obs").cast("double")
    neg_ln = -F.log((n - x + 0.5) / (n + 0.5))
    ok = (F.col("n_obs") > 0) & (F.col("_span") > 0)
    return agg.select(
        url_col,
        "n_obs",
        "n_changes",
        F.when(ok, F.round(iv, 3)).alias("avg_interval_sec"),
        F.when(ok, F.round(neg_ln / iv * F.lit(86400.0), 6)).alias(
            "lambda_per_day"
        ),
        F.when(ok & (F.col("n_changes") > 0), F.round(iv / neg_ln, 3)).alias(
            "change_interval_sec"
        ),
    )


def change_rate_sql(
    history_cte: str,
    tiebreak: str = "event_id",
) -> str:
    """The IDENTICAL pinned estimator for DuckDB over ``history_cte``
    — a named CTE ``hist AS (SELECT url, ts, digest, {tiebreak} …)``
    with ts already an epoch-comparable TIMESTAMP."""
    return f"""
WITH {history_cte},
lagged AS (
  SELECT url,
    CASE WHEN lag(digest) OVER (PARTITION BY url ORDER BY ts, {tiebreak})
              IS NOT NULL
          AND digest <> lag(digest)
              OVER (PARTITION BY url ORDER BY ts, {tiebreak})
         THEN 1 ELSE 0 END AS chg,
    -- floor, not bare epoch: Spark's unix_timestamp truncates to
    -- whole seconds (the ORACLE_RECRAWL precedent)
    CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM hist
), agg AS (
  SELECT url, count(*) - 1 AS n_obs,
         CAST(sum(chg) AS BIGINT) AS n_changes,
         max(es) - min(es) AS span
  FROM lagged GROUP BY url
)
SELECT url, n_obs, n_changes,
  CASE WHEN n_obs > 0 AND span > 0
       THEN round(CAST(span AS DOUBLE) / CAST(n_obs AS DOUBLE), 3)
  END AS avg_interval_sec,
  CASE WHEN n_obs > 0 AND span > 0 THEN round(
    (-ln((CAST(n_obs AS DOUBLE) - CAST(n_changes AS DOUBLE) + 0.5)
         / (CAST(n_obs AS DOUBLE) + 0.5)))
    / (CAST(span AS DOUBLE) / CAST(n_obs AS DOUBLE)) * 86400.0, 6)
  END AS lambda_per_day,
  CASE WHEN n_obs > 0 AND span > 0 AND n_changes > 0 THEN round(
    (CAST(span AS DOUBLE) / CAST(n_obs AS DOUBLE))
    / (-ln((CAST(n_obs AS DOUBLE) - CAST(n_changes AS DOUBLE) + 0.5)
           / (CAST(n_obs AS DOUBLE) + 0.5))), 3)
  END AS change_interval_sec
FROM agg
"""

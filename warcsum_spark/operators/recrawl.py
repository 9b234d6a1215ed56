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

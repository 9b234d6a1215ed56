"""Gap-based sessionization of an event/crawl log.

The reference has no session operator (its unit of work is the WARC
member), but a crawl-scale engine needs one constantly: grouping fetch
events per host into politeness sessions, grouping user events into
visits, bounding re-crawl cadence windows. This is the standard
lag-gap → running-sum formulation, expressed so the whole operator is
ONE hash exchange on the partition key:

* ``lag(ts)`` and the running ``sum(is_new)`` share the same
  ``(key, ts, tiebreak)`` window ordering, so Catalyst plans a single
  Exchange(hashpartitioning(key)) followed by one sort feeding both
  window functions — no second shuffle (same discipline as
  operators/collres.py, asserted in tests/test_plan_quality.py).
* The session aggregate then groups by (key, session_no), whose
  ClusteredDistribution is satisfied by the same exchange — at 100 TB
  the whole operator shuffles each event row exactly once.

Skew stance: one hot key (a crawler hammering one host) serializes its
own window sort but nothing else; for pathological keys, pre-split by
day first (sessions never span the split at sane gaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _secs(c: Column) -> Column:
    """Epoch seconds (floored). The extra cast("timestamp") legalizes
    TIMESTAMP_NTZ inputs (parquet without tz) — NTZ→BIGINT is not a legal
    direct cast; under the engine's fixed UTC session timezone the NTZ→TZ
    hop is the identity."""
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Events + ``session_no`` (1-based per key, ordered by ts).

    A new session starts when the gap to the previous event of the same
    key EXCEEDS ``gap_seconds`` (strict >, boundary-exact). Ordering ties
    on ``ts`` are broken by ``tiebreak_col`` so the numbering is
    deterministic."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (_secs(F.col(ts_col)) - _secs(prev_ts) > gap_seconds)
    ).cast("int")
    return events.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """One row per (key, session_no): event count, start/end, duration,
    summed value. Single shuffle end-to-end (see module docstring)."""
    s = sessionize(events, gap_seconds, key_col, ts_col, tiebreak_col)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(_secs(F.col(ts_col))) - F.min(_secs(F.col(ts_col)))).alias(
            "duration_sec"
        ),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(key_col, "session_no").agg(*aggs)

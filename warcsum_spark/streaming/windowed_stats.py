"""Event-time windowed aggregation with late-data watermarks — the
streaming form of the run-statistics/throughput metrics (A5/A6): digests
computed or URLs scheduled per host per time window, tolerating
out-of-order arrival up to the watermark delay.

Semantics (Structured Streaming):

* ``withWatermark(ts, delay)`` bounds state: a window finalizes (and, in
  append mode, emits exactly once) when the watermark — max observed event
  time minus ``delay`` — passes the window end; rows arriving later than
  the watermark are DROPPED, which is the documented trade of bounded
  state for bounded lateness at 10^10-URL scale.
* The same plan runs batch (``windowed_counts(df)``) and streaming
  (``windowed_counts(readStream df)``) — tests pin stream==batch on the
  finalized-window subset and prove a beyond-watermark straggler is
  dropped by the stream but present in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("host",),
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """(window_start, window_end, *keys, n[, total]) — event-time tumbling
    (or sliding) window counts. On a streaming DataFrame the watermark
    bounds state and drops >-watermark-late rows; on a batch DataFrame
    ``withWatermark`` is a no-op and every window is reported."""
    src = events.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total"))
    return (
        src.groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(k) for k in keys],
            *[F.col(a) for a in (["n"] + (["total"] if value_col else []))],
        )
    )

"""T75 — politeness fetch-time assignment: turn a scheduled frontier
round (frontier/politeness.py's per-host ranks) into the actual fetch
TIMELINE a polite fetcher executes — per-URL dispatch offsets under
each host's Crawl-delay, per-host finish times, and the round makespan.

Why this is an operator and not fetcher-internal bookkeeping: the
makespan is what closes the scheduling loop. A round whose slowest host
(rank × delay) dominates wall-clock wants its budget rebalanced
(frontier/budget.py) BEFORE fetching; capacity planning ("can N
fetchers clear this round inside the politeness window?") reads the
same table; and the fetch log's expected-vs-actual dispatch drift is a
politeness-compliance audit. All of that consumes (url, fetch_at), so
the engine computes it declaratively.

Timeline semantics (deterministic, engine-portable): host h's rank-r
URL dispatches at ``round_start + (r − 1) · delay_h`` — the earliest
schedule a single-connection-per-host fetcher with delay compliance
can achieve; the host finishes at ``rank_max · delay_h`` (its last
dispatch plus the mandatory gap before the host is clean again).

Plan shape: the delay table is a robots-derived dimension → BROADCAST;
the offset arithmetic is map-only off the already-computed host_rank —
ZERO new exchanges on the scheduled rows. Host summaries are one
dimension-sized aggregate; delays round to 6 dp at output only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_fetch_times(
    scheduled: DataFrame,
    delays: DataFrame | None = None,
    default_delay: float = 1.0,
    round_start: float = 0.0,
    host_col: str = "host",
    rank_col: str = "host_rank",
) -> DataFrame:
    """Input columns + (crawl_delay, fetch_at): dispatch offset in
    seconds from ``round_start`` for every scheduled URL. ``delays`` is
    a small (host, crawl_delay) dimension (robots.py's parse output);
    missing or null-delay hosts get ``default_delay``."""
    df = scheduled
    if delays is not None:
        d = delays.select(
            host_col, F.col("crawl_delay").alias("_delay")
        )
        df = df.join(F.broadcast(d), host_col, "left")
    else:
        df = df.withColumn("_delay", F.lit(None).cast("double"))
    delay = F.coalesce(
        F.col("_delay").cast("double"), F.lit(float(default_delay))
    )
    return df.select(
        *scheduled.columns,
        F.round(delay, 6).alias("crawl_delay"),
        F.round(
            F.lit(float(round_start))
            + (F.col(rank_col) - 1).cast("double") * delay,
            6,
        ).alias("fetch_at"),
    )


def round_makespan(
    assigned: DataFrame, host_col: str = "host", rank_col: str = "host_rank"
) -> DataFrame:
    """(host, n_urls, finish_at) per host — finish = last dispatch plus
    one mandatory delay gap, i.e. ``rank_max · delay``. The round's
    makespan is ``max(finish_at)``; hosts at the top of this table are
    the budget-rebalancing targets."""
    return assigned.groupBy(host_col).agg(
        F.count("*").alias("n_urls"),
        F.round(
            F.max(
                F.col("fetch_at") + F.col("crawl_delay")
            ),
            6,
        ).alias("finish_at"),
    )

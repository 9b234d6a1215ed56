"""Range (interval-containment) join — match point rows to interval
rows with ``lo ≤ point ≤ hi`` — without the plan Spark gives the naive
predicate. A non-equi join has no hash key, so Catalyst falls back to
BroadcastNestedLoopJoin: O(points × intervals) comparisons. Fine for a
dozen intervals, a non-starter at 10^10 points × 10^6 intervals.

The scale path is BINNING (the same trick Databricks' range-join hint
and every streaming interval-join implement): quantize the number line
into fixed-width bins,

* each point lands in exactly ONE bin (``floor(point / width)``);
* each interval EXPLODES to every bin it overlaps
  (``floor(lo/w) … floor(hi/w)``);
* equi-join on the bin id — a plain shuffled/broadcast HASH join —
  then re-check the exact predicate to discard same-bin non-overlaps.

No dedup pass is needed: a point exists in one bin only, so it meets
each interval at most once.

Cost model for ``bin_width``: intervals fan out ×(span/width + 1), and
too-wide bins put unrelated rows in the same hash bucket only to fail
the post-filter. Set it near the MEDIAN interval span — fan-out stays
O(1) per interval and bucket selectivity stays high. A pathological mix
(a few 10^6-wide intervals among unit spans) is better served by
splitting the interval table by span and unioning two binned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner containment join: every (point row × interval row) pair
    with ``lo ≤ point ≤ hi``, as a hash join on bin ids. Column sets
    must be disjoint. ``broadcast_intervals`` forces the exploded
    interval side broadcast (right for dimension-table-sized interval
    sets: the join then ships NO point rows at all)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"point/interval column collision {sorted(overlap)}; alias first"
        )
    w = F.lit(float(bin_width))
    p = points.withColumn("_bin", F.floor(F.col(point_col) / w))
    lo_bin = F.floor(F.col(lo_col) / w)
    hi_bin = F.floor(F.col(hi_col) / w)
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        p.join(iv, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )

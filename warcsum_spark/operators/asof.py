"""As-of (most-recent-at-or-before) join — the temporal join Spark's
DataFrame API lacks. For each left row, attach the right row with the
greatest ``right_time`` ≤ ``left_time`` within the same key (pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, direction=backward,
inclusive).

In a crawl/recrawl pipeline this is "state as of fetch time": for every
scheduled fetch, the most recent robots snapshot / sitemap read /
previous-capture digest for that host at or before the fetch timestamp.

Spark-first shape — the UNION-WINDOW pattern, not a join at all:

1. tag both sides, union them (right payload packed in one struct
   column, null on left rows);
2. ONE hash exchange on the key + one window sort on
   ``(time, side, tie)`` with right rows ordered before left rows at
   equal timestamps (that ordering IS the ≤-inclusivity);
3. ``last(payload, ignorenulls=True)`` over rows-unbounded-preceding —
   a running carry-forward, evaluated streaming within the sort;
4. keep left rows, unpack the struct.

Why not ``applyInPandas`` + ``merge_asof``: same shuffle, but every
row then crosses the JVM↔Arrow boundary and the per-key pandas frames
must fit in memory. The window form stays JVM-side, spills through
Tungsten sort, and handles a 10^8-row key without materializing it.

Scale note: a skewed key (one host with 10^8 left rows) serializes into
one partition's sort — inherent to per-key total ordering. Tungsten
handles it by spilling; if the carried payload is wide, project it to
the columns you need first (the operator packs ONLY ``right_cols``).

Right-side timestamp ties are broken by ``right_tie`` (largest wins,
matching DuckDB's max-row choice when made deterministic); pass a
unique column or pre-aggregate duplicates away.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: Sequence[str] | None = None,
    right_tie: str | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: all left rows and columns, plus ``right_cols``
    from the most recent right row at-or-before the left row's time
    (null when none, or when it is older than ``tolerance_sec``)."""
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols {sorted(overlap)} collide with left columns; "
            "alias them on the right side first"
        )

    payload = F.struct(
        F.col(right_time).alias("_rt"), *[F.col(c) for c in right_cols]
    )
    tie = F.col(right_tie) if right_tie else F.lit(0)
    r = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts
        tie.alias("_tie"),
        payload.alias("_r"),
    )
    l = left.select(
        "*",
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    unioned = l.unionByName(r.select(*keys, "_t", "_side", "_tie", "_r"),
                            allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_r", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        # cast to double, not long: long would FLOOR both timestamps and
        # misjudge fractional-second gaps on either side of the bound
        in_range = (
            F.col("_t").cast("double") - F.col("_asof._rt").cast("double")
        ) <= float(tolerance_sec)
        carried = carried.withColumn(
            "_asof", F.when(in_range, F.col("_asof"))
        )
    return carried.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in right_cols],
    )

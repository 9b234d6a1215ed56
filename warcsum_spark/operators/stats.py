"""A5 run statistics (reference: print_stats warccollres.c:1338–1368).

Single-pass aggregation; percentages derived driver-side from the one-row
result — no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_stats(extended: DataFrame) -> dict:
    """Counters over an extended manifest: total / unique / duplicates /
    collisions / distinct digests (+ derived percentages)."""
    row = extended.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("copy_no") == 1, 1).otherwise(0)).alias("unique"),
        F.sum(
            F.when((F.col("ext") > 1) & (F.col("copy_no") == 1), 1).otherwise(0)
        ).alias("collisions"),
        F.count_distinct("digest").alias("distinct_digests"),
    ).collect()[0]
    total = row["total"] or 0
    unique = row["unique"] or 0
    out = {
        "total": total,
        "unique": unique,
        "duplicates": total - unique,
        "collisions": row["collisions"] or 0,
        "distinct_digests": row["distinct_digests"] or 0,
    }
    out["pct_unique"] = (100.0 * unique / total) if total else 0.0
    out["pct_duplicates"] = (100.0 * out["duplicates"] / total) if total else 0.0
    return out

"""A5 run statistics (reference: print_stats warccollres.c:1338–1368).

Single-pass aggregation; percentages derived driver-side from the one-row
result — no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, bytes_col: str | None = None) -> DataFrame:
    """A6 / north_rule: per-partition lineage + throughput metrics —
    (partition_id, n_rows[, n_bytes]). One extra narrow pass; persisted
    next to each checkpoint so a resumed run can attribute work and skew
    to specific partitions. The reference only has global wall-clock
    counters (warccollres.c:1362–1366); per-partition visibility is what a
    1000-executor run actually needs to find stragglers."""
    aggs = [F.count("*").alias("n_rows")]
    if bytes_col is not None:
        aggs.append(F.sum(F.length(bytes_col)).cast("long").alias("n_bytes"))
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(*aggs)


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

"""Token-budget shard packing — assign documents, in a deterministic
global order, to contiguous training shards of ~``budget`` tokens each
(the "fill shard 0, then shard 1, …" step that turns a filtered corpus
into fixed-size training files).

The core is a GLOBAL PREFIX SUM, which naive Spark gets wrong at scale:
``Window.orderBy(key)`` with no partition spec collapses the whole
corpus into ONE task (Spark even warns). The scalable form is the
textbook two-level scan:

1. bucket rows by an explicit, DETERMINISTIC coarse range of the order
   key (``key div bucket_size`` — no sampling, unlike
   ``repartitionByRange``, so the result is a pure function of the
   data);
2. within-bucket running sum — a window partitioned by bucket: ONE hash
   exchange of the corpus, each bucket sorted independently;
3. per-bucket totals → bucket offsets — an unpartitioned window over
   the BUCKET table (corpus_size / bucket_size rows; at 10^10 docs and
   bucket_size 10^6 that is 10^4 rows — a non-cost);
4. broadcast the offsets back: ``cum_before = offset + within - self``,
   ``shard = floor(cum_before / budget)``.

A document straddling a budget boundary goes to the shard its FIRST
token falls in (floor of its starting offset), so shards overshoot by
at most one document — the standard packing convention.

Skew note: bucket occupancy follows the key density, not a sampled
equal-rows split. For dense-sequential ids (the normal case) buckets
are uniform; for sparse/clustered keys pick ``bucket_size`` so the
largest bucket's rows sort comfortably in one task (the same knob a
range partitioner exposes as partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str = "doc_id",
    bucket_size: int = 100_000,
    shard_col: str = "shard",
) -> DataFrame:
    """+ ``cum_before`` (tokens strictly before this doc in order) and
    ``shard_col``. Exact integer arithmetic throughout."""
    if budget <= 0 or bucket_size <= 0:
        raise ValueError("budget and bucket_size must be positive")
    bucket = F.floor(F.col(order_col) / F.lit(bucket_size))
    staged = df.withColumn("_bucket", bucket)

    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(token_col).over(w_in), F.lit(0)).cast("long")

    totals = staged.groupBy("_bucket").agg(
        F.sum(token_col).cast("long").alias("_btotal")
    )
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_btotal").over(w_off), F.lit(0)).alias("_offset"),
    )

    return (
        staged.join(F.broadcast(offsets), "_bucket")
        .withColumn("cum_before", (F.col("_offset") + within))
        .withColumn(
            shard_col, F.floor(F.col("cum_before") / F.lit(budget)).cast("long")
        )
        .drop("_bucket", "_offset")
    )

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


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T76 — GPT-style sequence packing: concatenate the corpus in a
    SEEDED permutation order (epoch order ≠ crawl order) and split the
    token stream into fixed ``seq_len`` windows — the layout causal-LM
    training actually consumes, where documents straddle sequence
    boundaries rather than padding them.

    Returns one row per document:
    (doc_id, shard_id, pos, n_tokens, tok_start, seq_id_start,
    seq_id_end, offset_in_seq) — ``tok_start`` is the document's
    0-based offset in the concatenated token stream, ``seq_id_start/
    _end`` the first/last training sequence it touches, and
    ``offset_in_seq`` its position inside the first one. A loader
    materializes sequence s by reading docs with
    ``seq_id_start <= s <= seq_id_end`` in (shard_id, pos) order.

    Scale shape — no global sort, no corpus re-join:
    * the permutation is shuffle.py's two-level form, and the per-doc
      token count RIDES its one exchange (``_permutation_positions``
      carry — a second corpus-keyed join to re-attach counts would
      double the shuffle);
    * within-shard running token sums share the permutation window's
      partitioning (same exchange);
    * shard token totals → offsets: a window over the ≤ n_shards-row
      dimension, broadcast back (the pack_shards discipline).
    Tokens are the battery-wide whitespace tokens; empty docs occupy
    zero tokens and report their boundary position."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from warcsum_spark.operators.shuffle import _permutation_positions

    norm = F.trim(
        F.regexp_replace(F.col(text_col), r"[ \t\n\x0b\f\r]+", " ")
    )
    n_tokens = (
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tokens")
    )
    pos = _permutation_positions(
        docs, n_shards, seed, id_col, carry=[n_tokens]
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = pos.withColumn(
        "_start_in_shard", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    totals = within.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("_tok")
    )
    offsets = totals.select(
        "shard_id",
        F.sum("_tok")
        .over(
            Window.orderBy("shard_id").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("_off"),
    ).fillna(0, subset=["_off"])
    start = F.col("_off") + F.col("_start_in_shard")
    last_tok = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return within.join(F.broadcast(offsets), "shard_id").select(
        "doc_id",
        "shard_id",
        "pos",
        "n_tokens",
        start.alias("tok_start"),
        F.floor(start / seq_len).cast("long").alias("seq_id_start"),
        F.floor(last_tok / seq_len).cast("long").alias("seq_id_end"),
        (start % seq_len).alias("offset_in_seq"),
    )

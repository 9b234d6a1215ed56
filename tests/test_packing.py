"""operators/packing.py — two-level prefix sum vs the single-partition
global window (the executable spec), invariances, and the plan property
that no corpus-wide single-task sort exists."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from warcsum_spark.operators.packing import pack_shards


def _corpus(spark, n=500, seed=3, sparse=False):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        did = i * 977 if sparse else i  # sparse: exercise uneven buckets
        rows.append((did, rng.randint(1, 400)))
    return spark.createDataFrame(rows, "doc_id long, tokens long")


def _reference(df, budget):
    """Global single-partition window — correct by construction, the
    thing pack_shards must equal while scaling."""
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return {
        r["doc_id"]: (r["cb"], r["sh"])
        for r in df.select(
            "doc_id",
            F.coalesce(F.sum("tokens").over(w), F.lit(0)).alias("cb"),
        )
        .withColumn("sh", F.floor(F.col("cb") / budget))
        .collect()
    }


@pytest.mark.parametrize("bucket_size", [1, 7, 100, 10**9])
def test_matches_global_window(spark, bucket_size):
    df = _corpus(spark)
    got = {
        r["doc_id"]: (r["cum_before"], r["shard"])
        for r in pack_shards(
            df, "tokens", budget=5000, bucket_size=bucket_size
        ).collect()
    }
    assert got == _reference(df, 5000)


def test_sparse_keys_and_repartition_invariance(spark):
    df = _corpus(spark, sparse=True)
    a = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(df, "tokens", budget=3000, bucket_size=50).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(
            df.repartition(17), "tokens", budget=3000, bucket_size=50
        ).collect()
    }
    assert a == b == {k: v[1] for k, v in _reference(df, 3000).items()}


def test_shard_sizes_respect_budget(spark):
    df = _corpus(spark)
    out = pack_shards(df, "tokens", budget=4000, bucket_size=64)
    sizes = {
        r["shard"]: r["s"]
        for r in out.groupBy("shard").agg(F.sum("tokens").alias("s")).collect()
    }
    # every shard except possibly the last holds >= budget - max_doc and
    # overshoots by < one document (straddlers assigned by start offset)
    max_doc = 400
    last = max(sizes)
    for sh, s in sizes.items():
        assert s < 4000 + max_doc
        if sh != last:
            assert s >= 4000 - max_doc


def test_invalid_params_raise(spark):
    df = _corpus(spark, n=5)
    with pytest.raises(ValueError):
        pack_shards(df, "tokens", budget=0)
    with pytest.raises(ValueError):
        pack_shards(df, "tokens", budget=10, bucket_size=0)


def test_no_corpus_wide_single_partition_window(spark):
    """The only Exchange SinglePartition allowed is the one feeding the
    BUCKET-TOTALS window (dimension-sized); the corpus window must be
    hash-partitioned by bucket."""
    df = _corpus(spark)
    plan = (
        pack_shards(df, "tokens", budget=5000, bucket_size=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # corpus-side window partitioned by _bucket
    assert "Window [" in plan and "partitionBy" not in plan  # plan prints specs inline
    assert plan.count("Exchange SinglePartition") == 1, plan


# ---------------------------------------------------------------------------
# T76 — pack_sequences (GPT-style fixed-window sequence packing)
# ---------------------------------------------------------------------------

def _seq_ref(rows, seq_len, n_shards, seed):
    """Independent reference: same permutation (md5 order), then a plain
    sequential concat-and-split walk over the token stream."""
    import hashlib

    def key(i):
        return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()

    def shard(i):
        return int(key(i)[:2], 16) % n_shards

    toks = {i: (len(t.split()) if t.strip() else 0) for i, t in rows}
    order = sorted(toks, key=lambda i: (shard(i), key(i), i))
    out, cursor = {}, 0
    for i in order:
        n = toks[i]
        last = cursor + max(n, 1) - 1
        out[i] = (n, cursor, cursor // seq_len, last // seq_len,
                  cursor % seq_len)
        cursor += n
    return out


def test_pack_sequences_matches_reference(spark):
    from warcsum_spark.operators.packing import pack_sequences

    rows = [(i, ("tok " * ((i * 7) % 23 + 1)).strip()) for i in range(60)]
    rows += [(60, ""), (61, "   ")]  # zero-token docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_id_start"],
                      r["seq_id_end"], r["offset_in_seq"])
        for r in pack_sequences(df, seq_len=16, n_shards=4, seed=7).collect()
    }
    assert got == _seq_ref(rows, 16, 4, 7)


def test_pack_sequences_token_stream_is_gapless(spark):
    from warcsum_spark.operators.packing import pack_sequences

    rows = [(i, "a b c d e f g"[: (i % 13) + 1]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["tok_start"], r["n_tokens"])
        for r in pack_sequences(df, seq_len=8, n_shards=4).collect()
    )
    cursor = 0
    for start, n in out:
        assert start == cursor
        cursor += n


def test_pack_sequences_repartition_invariant_and_validates(spark):
    import pytest

    from warcsum_spark.operators.packing import pack_sequences

    rows = [(i, "w " * (i % 5 + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df, seq_len=8).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(11), seq_len=8).collect()))
    assert a == b
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)

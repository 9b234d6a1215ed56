"""T60 deterministic corpus shuffle (operators/shuffle.py)."""

from __future__ import annotations

import hashlib

from warcsum_spark.operators.shuffle import permute_corpus


def _df(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_global_pos_is_a_permutation(spark):
    out = permute_corpus(_df(spark, 100), n_shards=4).collect()
    assert sorted(r.global_pos for r in out) == list(range(1, 101))
    # global order == (shard, pos) order
    by_global = sorted(out, key=lambda r: r.global_pos)
    assert by_global == sorted(out, key=lambda r: (r.shard_id, r.pos))


def test_matches_md5_reference_order(spark):
    n = 60
    out = {r.doc_id: r for r in permute_corpus(_df(spark, n), n_shards=4).collect()}
    ref = []
    for i in range(n):
        h = hashlib.md5(f"42:{i}".encode()).hexdigest()
        ref.append((int(h[:2], 16) % 4, h, i))
    ref.sort()
    for pos_global, (shard, _h, i) in enumerate(ref, start=1):
        assert out[i].shard_id == shard
        assert out[i].global_pos == pos_global


def test_partitioning_invariance_and_seed_sensitivity(spark):
    df = _df(spark, 80)
    a = {r.doc_id: r.global_pos for r in permute_corpus(df, 4, seed=1).collect()}
    b = {
        r.doc_id: r.global_pos
        for r in permute_corpus(df.repartition(7), 4, seed=1).collect()
    }
    c = {r.doc_id: r.global_pos for r in permute_corpus(df, 4, seed=2).collect()}
    assert a == b
    assert a != c
    assert sorted(c.values()) == list(range(1, 81))


def test_no_global_corpus_sort_in_plan(spark):
    df = permute_corpus(_df(spark, 50), n_shards=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # corpus-side exchanges are hash partitions; the only rangepartition
    # (global sort) allowed is none at all
    assert "rangepartitioning" not in plan.lower(), plan

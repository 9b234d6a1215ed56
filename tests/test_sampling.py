"""functions/sampling.py — deterministic hash splits and subsets."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from warcsum_spark.functions.sampling import (
    hash_split,
    sample_fraction,
    split_bounds,
)


def ref_bucket(i: int, seed: int = 42) -> int:
    return hashlib.md5(f"{seed}:{i}".encode()).digest()[0]


def test_split_bounds_partition_the_buckets():
    bounds = split_bounds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert bounds == [("train", 0, 204), ("val", 204, 230), ("test", 230, 256)]
    # contiguous, exhaustive
    assert bounds[0][1] == 0 and bounds[-1][2] == 256
    for (_, _, hi), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo


def test_hash_split_matches_reference_and_is_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    bounds = split_bounds({"train": 0.8, "val": 0.1, "test": 0.1})

    def expect(i):
        b = ref_bucket(i)
        for name, lo, hi in bounds:
            if lo <= b < hi:
                return name
        raise AssertionError(b)

    assert got == {i: expect(i) for i in range(1000)}
    # repartitioning must not change any assignment
    got2 = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(13)).collect()}
    assert got2 == got
    # shares roughly match weights at n=1000
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.74 * 1000 < n_train < 0.86 * 1000


def test_sample_fraction_deterministic_subset(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    kept = {r["doc_id"] for r in sample_fraction(df, 0.25).collect()}
    assert kept == {i for i in range(1000) if ref_bucket(i) < 64}
    # monotone: a larger fraction strictly contains a smaller one
    kept_half = {r["doc_id"] for r in sample_fraction(df, 0.5).collect()}
    assert kept <= kept_half


def test_hash_split_seed_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, seed=1).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, seed=2).collect()}
    assert a != b


def test_split_bounds_rejects_sub_bucket_weight():
    """A weight below the 1/256 share quantum would silently get zero
    rows; it must raise instead."""
    import pytest

    # non-last tiny split floors to zero buckets (the last one absorbs
    # the remainder, so it always gets >=1)
    with pytest.raises(ValueError, match="empty bucket range"):
        split_bounds({"tiny": 0.001, "train": 0.999})
    # boundary: exactly one bucket is fine
    bounds = split_bounds({"a": 255, "b": 1})
    assert bounds == [("a", 0, 255), ("b", 255, 256)]


def test_stratified_rates_and_determinism(spark):
    """Per-stratum rates land near target (within 1/256 quantization +
    binomial noise), membership is deterministic, repartition-invariant,
    and nested: lowering a rate yields a SUBSET of the higher-rate
    sample (corpus versions nest)."""
    import hashlib

    from warcsum_spark.functions.sampling import sample_stratified

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"a": 0.25, "b": 0.75}
    out = sample_stratified(df, rates, default_rate=1.0)
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}

    # independent reference
    def bucket(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:2], 16)

    expect = {
        (i, l)
        for i, l in rows
        if bucket(i) < int(rates.get(l, 1.0) * 256)
    }
    assert got == expect
    # per-stratum counts near targets
    from collections import Counter

    c = Counter(l for _, l in got)
    assert abs(c["a"] / 2000 - 0.25) < 0.05
    assert abs(c["b"] / 2000 - 0.75) < 0.05
    assert c["c"] == 2000  # default_rate=1.0 keeps unlisted strata whole
    # repartition invariance
    got2 = {
        (r["doc_id"], r["lang"])
        for r in sample_stratified(df.repartition(13), rates, default_rate=1.0).collect()
    }
    assert got2 == got
    # nesting: a lower rate is a subset of the higher one
    lower = {
        (r["doc_id"], r["lang"])
        for r in sample_stratified(df, {"a": 0.1, "b": 0.75}, default_rate=1.0).collect()
    }
    assert lower <= got


def test_stratified_default_drop_and_plan(spark):
    """default_rate=0.0 drops unlisted strata; the plan is a pure filter
    (no exchange, no Python)."""
    from warcsum_spark.functions.sampling import sample_stratified

    df = spark.createDataFrame(
        [(i, ["a", "x"][i % 2]) for i in range(200)], "doc_id long, lang string"
    )
    out = sample_stratified(df, {"a": 1.0})
    rows = out.collect()
    assert rows and all(r["lang"] == "a" for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

"""T64 — HDR quantile sketch: bucketing vs an independent pure-Python
reference (int.bit_length only), exactness for small values, the
2^-sub_bits relative-error bound, merge = sketch-of-union, and plan
shape (ONE exchange for the sketch)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.quantiles import (
    hdr_merge,
    hdr_quantiles,
    hdr_sketch,
)


def _ref_bucket(v: int, s: int) -> tuple[int, int]:
    """Independent reference: same bucketing, bit ops only."""
    if v <= 0:
        return (-1, 0)
    e = v.bit_length() - 1
    if e <= s:
        return (e, v - (1 << e))
    return (e, (v >> (e - s)) - (1 << s))


def _ref_lower_bound(e: int, sub: int, s: int) -> int:
    if e < 0:
        return 0
    if e <= s:
        return (1 << e) + sub
    return ((1 << s) + sub) << (e - s)


def _ref_quantile(values: list[int], q: float, s: int) -> int:
    """Nearest-rank quantile THROUGH the sketch (the operator's
    contract), using the same ceil-on-double target."""
    buckets: dict[tuple[int, int], int] = {}
    for v in values:
        b = _ref_bucket(v, s)
        buckets[b] = buckets.get(b, 0) + 1
    target = math.ceil(q * float(len(values)))
    cum = 0
    for (e, sub) in sorted(buckets):
        cum += buckets[(e, sub)]
        if cum >= target:
            return _ref_lower_bound(e, sub, s)
    raise AssertionError("unreachable")


VALUES = [0, 1, 2, 3, 7, 8, 9, 31, 32, 33, 100, 1000, 12345,
          2**20 + 17, 2**33 + 12345, 5, 5, 5, 64, 65]


@pytest.fixture(scope="module")
def vals_df(spark):
    rows = [("a", v) for v in VALUES] + [("b", v * 3 + 1) for v in VALUES]
    return spark.createDataFrame(rows, "key string, v long")


def test_bucketing_matches_reference(spark, vals_df):
    sk = hdr_sketch(vals_df, ["key"], "v", sub_bits=5).collect()
    got = {(r.key, r.e, r.sub): r.cnt for r in sk}
    ref: dict[tuple[str, int, int], int] = {}
    for key, mul in (("a", 1), ("b", 3)):
        for v in VALUES:
            e, sub = _ref_bucket(v * mul + (0 if key == "a" else 1), 5)
            ref[(key, e, sub)] = ref.get((key, e, sub), 0) + 1
    assert got == ref


@pytest.mark.parametrize("q", [0.5, 0.9, 0.99, 1.0])
def test_quantiles_match_reference(spark, vals_df, q):
    out = hdr_quantiles(
        hdr_sketch(vals_df, ["key"], "v", sub_bits=5), ["key"], [q], 5
    ).collect()
    by_key = {r.key: r.value for r in out}
    assert by_key["a"] == _ref_quantile(VALUES, q, 5)
    assert by_key["b"] == _ref_quantile([v * 3 + 1 for v in VALUES], q, 5)


def test_small_values_exact(spark):
    """Every value <= 2^sub_bits is its own bucket: quantiles of small
    values are EXACT nearest-rank order statistics."""
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = hdr_quantiles(hdr_sketch(df, [], "v", 5), [], [0.25, 0.5, 1.0], 5)
    got = {r.q: r.value for r in out.collect()}
    assert got == {0.25: 4, 0.5: 8, 1.0: 16}


def test_relative_error_bound(spark):
    """For any value set, the sketch's quantile under-estimates the
    exact sketch-rank element by < 2^-sub_bits relative."""
    import random

    rng = random.Random(7)
    vals = [rng.randrange(1, 2**40) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    s = 5
    out = hdr_quantiles(hdr_sketch(df, [], "v", s), [], [0.5, 0.9, 0.99], s)
    svals = sorted(vals)
    for r in out.collect():
        exact = svals[math.ceil(r.q * float(len(vals))) - 1]
        assert r.value <= exact
        assert exact < r.value * (1.0 + 2.0 ** (-s)) + 1


def test_merge_equals_union_sketch(spark, vals_df):
    half_a = vals_df.filter(F.col("v") % 2 == 0)
    half_b = vals_df.filter(F.col("v") % 2 != 0)
    merged = hdr_merge(
        hdr_sketch(half_a, ["key"], "v", 5), hdr_sketch(half_b, ["key"], "v", 5)
    )
    whole = hdr_sketch(vals_df, ["key"], "v", 5)
    m = {(r.key, r.e, r.sub): r.cnt for r in merged.collect()}
    w = {(r.key, r.e, r.sub): r.cnt for r in whole.collect()}
    assert m == w


def test_zero_and_negative_guard(spark):
    df = spark.createDataFrame([(0,), (0,), (1,)], "v long")
    sk = {(r.e, r.sub): r.cnt for r in hdr_sketch(df, [], "v", 5).collect()}
    assert sk == {(-1, 0): 2, (0, 0): 1}
    out = hdr_quantiles(hdr_sketch(df, [], "v", 5), [], [0.5], 5).collect()
    assert out[0].value == 0


def test_validation():
    from warcsum_spark.operators.quantiles import hdr_columns

    with pytest.raises(ValueError):
        hdr_columns(F.lit(1), sub_bits=9)
    with pytest.raises(ValueError):
        hdr_quantiles(None, [], [], 5)
    with pytest.raises(ValueError):
        hdr_merge()


def test_sketch_single_exchange(spark, vals_df):
    plan = hdr_sketch(vals_df, ["key"], "v", 5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1

"""T47 Count-Min sketch: overestimate-only guarantee, exact-at-wide-w,
linear merge, weighted inputs, keyed sketches, and heavy-hitter
recovery under forced collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.cms import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    cms_topk,
)


def _stream(spark, n=2000):
    # even ids spread over 50 cold keys, odd over 5 hot keys (~10x)
    e = F.col("id")
    item = F.when(
        e % 2 == 0, F.concat(F.lit("c"), (e % 50).cast("string"))
    ).otherwise(F.concat(F.lit("h"), (e % 5).cast("string")))
    return spark.range(n).select(item.alias("item"))


def _exact(df):
    return {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }


def test_estimate_never_underestimates(spark):
    src = _stream(spark)
    sk = cms_sketch(src, [], "item", d=3, w=32)  # heavy collisions
    est = {
        r["item"]: r["est_cnt"]
        for r in cms_estimate(sk, src.distinct(), "item", d=3, w=32).collect()
    }
    exact = _exact(src)
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # total error is bounded: sum of counters per row equals stream size
    n = src.count()
    per_row = sk.groupBy("row_id").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == n for r in per_row)


def test_exact_when_no_collisions(spark):
    src = _stream(spark)
    sk = cms_sketch(src, [], "item", d=3, w=4096)  # 55 keys, 4096 buckets
    est = {
        r["item"]: r["est_cnt"]
        for r in cms_estimate(sk, src.distinct(), "item", d=3, w=4096).collect()
    }
    assert est == _exact(src)


def test_merge_equals_whole_stream_sketch(spark):
    a = _stream(spark, 1200)
    b = spark.range(1200, 2000).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("c"), (F.col("id") % 50).cast("string")),
        )
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 5).cast("string")))
        .alias("item")
    )
    whole = cms_sketch(a.unionByName(b), [], "item", d=3, w=64)
    merged = cms_merge(
        cms_sketch(a, [], "item", d=3, w=64),
        cms_sketch(b, [], "item", d=3, w=64),
    )
    as_dict = lambda df: {
        (r["row_id"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_dict(whole) == as_dict(merged)


def test_weighted_input_equals_repeated_rows(spark):
    raw = _stream(spark, 800)
    pre = raw.groupBy("item").agg(F.count("*").alias("n"))
    sk_raw = cms_sketch(raw, [], "item", d=3, w=64)
    sk_pre = cms_sketch(pre, [], "item", weight_col="n", d=3, w=64)
    as_dict = lambda df: {
        (r["row_id"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_dict(sk_raw) == as_dict(sk_pre)


def test_topk_recovers_heavy_hitters(spark):
    src = _stream(spark)
    sk = cms_sketch(src, [], "item", d=3, w=64)
    top = cms_topk(sk, src.distinct(), "item", k=5, d=3, w=64).collect()
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    # the 5 hot keys are ~10x any cold key; CMS overestimates cannot
    # promote a cold key past them at w=64 on this stream
    assert {r["item"] for r in top} == {f"h{i}" for i in range(5)}


def test_keyed_sketches_are_independent(spark):
    src = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.concat(F.lit("v"), (F.col("id") % 13).cast("string")).alias("item"),
    )
    sk = cms_sketch(src, ["grp"], "item", d=2, w=256)
    est = cms_estimate(
        sk, src.distinct(), "item", key_cols=["grp"], d=2, w=256
    )
    got = {(r["grp"], r["item"]): r["est_cnt"] for r in est.collect()}
    exact = {
        (r["grp"], r["item"]): r["n"]
        for r in src.groupBy("grp", "item").agg(F.count("*").alias("n")).collect()
    }
    assert got == exact  # w >> keys: exact per group


def test_parameter_validation(spark):
    src = _stream(spark, 10)
    with pytest.raises(ValueError, match="d must"):
        cms_sketch(src, [], "item", d=0)
    with pytest.raises(ValueError, match="w must"):
        cms_sketch(src, [], "item", w=8)
    with pytest.raises(ValueError, match="row_id"):
        cms_merge(
            cms_sketch(src, [], "item"), key_cols=["bucket"]
        )


def test_single_scan_single_exchange_plan(spark):
    """The sketch build must be one scan + one exchange — the d hash
    rows come from an exploded array projection, not a d-way union."""
    src = _stream(spark)
    plan = (
        cms_sketch(src, [], "item", d=4, w=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Union" not in plan

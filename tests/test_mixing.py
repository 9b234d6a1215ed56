"""operators/mixing.py — domain reweighting: achieved proportions,
determinism, group dropping, and the no-driver-action plan property."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.mixing import (
    _FINE_BUCKETS,
    fine_bucket,
    group_fractions,
    mix_corpus,
)


def _corpus(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_fine_bucket_matches_hashlib(spark):
    df = spark.range(50).select(
        "id", fine_bucket(F.col("id"), seed=42).alias("b")
    )
    for r in df.collect():
        want = int(hashlib.md5(f"42:{r['id']}".encode()).hexdigest()[:4], 16)
        assert r["b"] == want


def test_binding_group_keeps_everything(spark):
    df = _corpus(spark, {"en": 400, "de": 100})
    # target 50/50: de (100 docs at share .5 → N=200) binds; en keeps 100
    fr = {r["lang"]: r.asDict() for r in group_fractions(df, "lang", {"en": 1, "de": 1}).collect()}
    assert fr["de"]["mix_frac"] == 1.0
    assert abs(fr["en"]["mix_frac"] - 0.25) < 1e-12


def test_achieved_proportions_near_target(spark):
    df = _corpus(spark, {"en": 3000, "de": 1000, "fr": 1000})
    out = mix_corpus(df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25})
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    total = sum(got.values())
    # fr/de bind at N=4000; quantization error is ±n/65536 per group
    assert got["fr"] == 1000 and got["de"] == 1000
    assert abs(got["en"] / total - 0.5) < 0.02


def test_unlisted_group_dropped_and_deterministic(spark):
    df = _corpus(spark, {"en": 200, "zz": 50})
    out = mix_corpus(df, "lang", {"en": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in mix_corpus(df.repartition(7), "lang", {"en": 1.0}).collect()}
    assert a == b


def test_invalid_weights_raise(spark):
    df = _corpus(spark, {"en": 10})
    with pytest.raises(ValueError, match="positive"):
        group_fractions(df, "lang", {"en": 0.0})


def test_no_driver_action_and_broadcast(spark):
    """The whole operator is one lazy plan (fractions computed inside
    it, broadcast back) — building it must trigger no Spark job, and
    the join must be a broadcast."""
    df = _corpus(spark, {"en": 30, "de": 10})
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = mix_corpus(df, "lang", {"en": 0.5, "de": 0.5})
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no eager job
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan

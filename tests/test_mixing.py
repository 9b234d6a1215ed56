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


def test_temperature_fractions_closed_form(spark):
    from warcsum_spark.operators.mixing import temperature_fractions

    rows = [(i, "en") for i in range(800)] + \
           [(i + 1000, "de") for i in range(150)] + \
           [(i + 2000, "sw") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: (r["n_group"], r["mix_frac"])
        for r in temperature_fractions(df, "lang", alpha=0.3).collect()
    }
    assert got["sw"] == (50, 1.0)  # rarest group keeps everything
    assert got["en"] == (800, round((50 / 800) ** 0.7, 6))
    assert got["de"] == (150, round((50 / 150) ** 0.7, 6))


def test_temperature_alpha_bounds(spark):
    import pytest

    from warcsum_spark.operators.mixing import temperature_fractions, temperature_mix

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError):
            temperature_fractions(df, "lang", alpha=bad)
    # alpha = 1 is the natural mix: every row survives
    rows = [(i, "en") for i in range(100)] + [(i + 500, "de") for i in range(10)]
    big = spark.createDataFrame(rows, "doc_id long, lang string")
    assert temperature_mix(big, "lang", alpha=1.0).count() == 110


def test_temperature_mix_flattens_and_is_stable(spark):
    from warcsum_spark.operators.mixing import temperature_mix

    rows = [(i, "en") for i in range(2000)] + \
           [(i + 10000, "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "lang", alpha=0.0)  # full flattening
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # alpha=0 equalizes toward n_min=200 up to hash quantization
    assert by["de"] == 200
    assert abs(by["en"] - 200) < 40
    # membership is a pure function of (seed, id): repartition-invariant
    again = temperature_mix(df.repartition(13), "lang", alpha=0.0)
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())

"""T43 — relational HyperLogLog: registers vs an independent pure-Python
reference (hashlib.md5, no Spark), merge semilattice laws, estimate
accuracy, and plan shape (ONE exchange for the sketch)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.hll import (
    _RANK_ZERO,
    _alpha,
    hll_count_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _ref_bucket_rank(value: str, p: int) -> tuple[int, int]:
    """Independent reference: same math, hashlib + int.bit_length only."""
    hh = hashlib.md5(value.encode()).hexdigest()
    bucket = int(hh[:8], 16) % (1 << p)
    suffix = int(hh[8:16], 16)
    rank = _RANK_ZERO if suffix == 0 else 33 - suffix.bit_length()
    return bucket, rank


def _ref_registers(values: list[tuple[str, str]], p: int) -> dict:
    regs: dict[tuple[str, int], int] = {}
    for key, v in values:
        b, r = _ref_bucket_rank(v, p)
        regs[(key, b)] = max(regs.get((key, b), 0), r)
    return regs


def _ref_estimate(regs: dict, key: str, p: int) -> float:
    m = 1 << p
    mine = {b: r for (k, b), r in regs.items() if k == key}
    s = sum(2.0 ** -r for r in mine.values()) + (m - len(mine))
    raw = _alpha(m) * m * m / s
    zeros = m - len(mine)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    if raw > 2.0**32 / 30.0:
        return -(2.0**32) * math.log(1.0 - raw / 2.0**32)
    return raw


@pytest.fixture(scope="module")
def urls(spark):
    # 3 hosts with very different URL cardinalities, duplicates included
    rows = []
    for i in range(6000):
        rows.append(("big.test", f"http://big.test/p/{i % 4000}"))
        if i < 900:
            rows.append(("mid.test", f"http://mid.test/a/{i % 300}"))
        if i < 40:
            rows.append(("small.test", f"http://small.test/{i % 12}"))
    return spark.createDataFrame(rows, "host string, url string"), rows


def test_registers_match_pure_python_reference(urls):
    df, rows = urls
    p = 8
    got = {
        (r["host"], r["bucket"]): r["max_rank"]
        for r in hll_sketch(df, ["host"], "url", p=p).collect()
    }
    assert got == _ref_registers(rows, p)


def test_estimate_matches_reference_and_is_accurate(urls):
    df, rows = urls
    est = {
        r["host"]: r["est_distinct"]
        for r in hll_count_distinct(df, ["host"], "url", p=10).collect()
    }
    regs = _ref_registers(rows, 10)
    truth = {"big.test": 4000, "mid.test": 300, "small.test": 12}
    for host, true_n in truth.items():
        assert est[host] == pytest.approx(
            round(_ref_estimate(regs, host, 10), 4), abs=1e-4
        )
        # ±1.04/sqrt(m) ≈ 3.3% at p=10; allow 4 sigma
        assert abs(est[host] - true_n) / true_n < 0.13


def test_merge_equals_direct_sketch(urls):
    df, _ = urls
    p = 9
    direct = hll_sketch(df, ["host"], "url", p=p)
    a = hll_sketch(df.filter(F.length("url") % 2 == 0), ["host"], "url", p=p)
    b = hll_sketch(df.filter(F.length("url") % 2 == 1), ["host"], "url", p=p)
    merged = hll_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # idempotent: merging the merged sketch with itself changes nothing
    again = hll_merge(merged, merged)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_merge_collapses_extra_keys(urls):
    df, _ = urls
    p = 9
    with_batch = df.withColumn("batch", F.length("url") % 3)
    per_batch = hll_sketch(with_batch, ["host", "batch"], "url", p=p)
    collapsed = hll_merge(per_batch, key_cols=["host", "bucket"])
    direct = hll_sketch(df, ["host"], "url", p=p)
    assert sorted(map(tuple, collapsed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_small_range_linear_counting(spark):
    # 3 distinct values in 1024 registers → linear-counting branch
    df = spark.createDataFrame(
        [("h", f"u{i % 3}") for i in range(50)], "host string, url string"
    )
    est = hll_count_distinct(df, ["host"], "url", p=10).collect()[0]
    assert abs(est["est_distinct"] - 3) < 0.01


def test_sketch_plan_has_one_exchange(urls):
    df, _ = urls
    plan = hll_sketch(df, ["host"], "url")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # partial aggregation map-side: two HashAggregates around the exchange
    assert plan.count("HashAggregate") >= 2


def test_validation():
    from warcsum_spark.operators.hll import hll_columns

    with pytest.raises(ValueError):
        hll_merge()
    with pytest.raises(ValueError, match="p must be"):
        hll_columns(F.lit("x"), p=3)


def test_merge_requires_bucket(urls):
    df, _ = urls
    s = hll_sketch(df, ["host"], "url")
    with pytest.raises(ValueError, match="bucket"):
        hll_merge(s, key_cols=["host"])

"""operators/asof.py vs pandas.merge_asof (the independent reference
implementation of backward-inclusive as-of semantics) plus edge cases
merge_asof can't express directly (ties, tolerance nulling)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.asof import asof_join


def _ts(s):
    return pd.Timestamp(s).to_pydatetime()


def test_matches_pandas_merge_asof(spark):
    left_rows = [
        (k, _ts(f"2026-01-01 00:0{m}:00"))
        for k in ("a", "b", "c")
        for m in range(6)
    ]
    right_rows = [
        ("a", _ts("2026-01-01 00:01:30"), 1.0),
        ("a", _ts("2026-01-01 00:04:00"), 2.0),
        ("b", _ts("2026-01-01 00:00:00"), 3.0),
        ("d", _ts("2026-01-01 00:00:00"), 9.0),  # key absent on left
    ]
    l = spark.createDataFrame(left_rows, "k string, ts timestamp")
    r = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    got = (
        asof_join(l, r, on="k", right_cols=["v"])
        .orderBy("k", "ts")
        .toPandas()
    )
    want = pd.merge_asof(
        pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values(["ts", "k"]),
        pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts"),
        on="ts",
        by="k",
    ).sort_values(["k", "ts"])
    assert list(got["v"].fillna(-1)) == list(want["v"].fillna(-1))


def test_equal_timestamp_is_inclusive(spark):
    l = spark.createDataFrame([("a", _ts("2026-01-01"))], "k string, ts timestamp")
    r = spark.createDataFrame(
        [("a", _ts("2026-01-01"), 7.0)], "k string, ts timestamp, v double"
    )
    assert asof_join(l, r, on="k", right_cols=["v"]).collect()[0]["v"] == 7.0


def test_right_ties_take_largest_tie_value(spark):
    l = spark.createDataFrame([("a", _ts("2026-01-02"))], "k string, ts timestamp")
    r = spark.createDataFrame(
        [("a", _ts("2026-01-01"), 1.0, 10), ("a", _ts("2026-01-01"), 2.0, 20)],
        "k string, ts timestamp, v double, rid int",
    )
    row = asof_join(l, r, on="k", right_cols=["v"], right_tie="rid").collect()[0]
    assert row["v"] == 2.0


def test_tolerance_nulls_stale_matches(spark):
    l = spark.createDataFrame(
        [("a", _ts("2026-01-01 01:00:00"))], "k string, ts timestamp"
    )
    r = spark.createDataFrame(
        [("a", _ts("2026-01-01 00:00:00"), 5.0)], "k string, ts timestamp, v double"
    )
    keep = asof_join(l, r, on="k", right_cols=["v"], tolerance_sec=3600)
    drop = asof_join(l, r, on="k", right_cols=["v"], tolerance_sec=3599)
    assert keep.collect()[0]["v"] == 5.0
    assert drop.collect()[0]["v"] is None


def test_column_collision_raises(spark):
    l = spark.createDataFrame([("a", _ts("2026-01-01"), 1.0)], "k string, ts timestamp, v double")
    r = spark.createDataFrame([("a", _ts("2026-01-01"), 2.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, on="k", right_cols=["v"])


def test_single_exchange_plan(spark):
    """The union-window form must cost ONE hash exchange total (plus the
    final projection) — not one per side plus a join."""
    l = spark.createDataFrame([("a", _ts("2026-01-01"))], "k string, ts timestamp")
    r = spark.createDataFrame(
        [("a", _ts("2026-01-01"), 1.0)], "k string, ts timestamp, v double"
    )
    plan = (
        asof_join(l, r, on="k", right_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_tolerance_respects_fractional_seconds(spark):
    """Gap 10.9 s with tolerance 10 must NOT match (long-cast flooring
    used to compare 10 <= 10 and keep it)."""
    l = spark.createDataFrame(
        [("a", _ts("2026-01-01 00:00:10.900"))], "k string, ts timestamp"
    )
    r = spark.createDataFrame(
        [("a", _ts("2026-01-01 00:00:00.000"), 5.0)],
        "k string, ts timestamp, v double",
    )
    drop = asof_join(l, r, on="k", right_cols=["v"], tolerance_sec=10)
    keep = asof_join(l, r, on="k", right_cols=["v"], tolerance_sec=11)
    assert drop.collect()[0]["v"] is None
    assert keep.collect()[0]["v"] == 5.0

"""operators/range_join.py — binned containment join vs a brute-force
reference, bin-width invariance, and the plan property that justifies
the operator's existence (hash join, not a nested loop)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.range_join import range_join


def _brute(points, intervals):
    return {
        (pid, iid)
        for pid, p in points
        for iid, lo, hi in intervals
        if lo <= p <= hi
    }


def _spark_pairs(spark, points, intervals, **kw):
    p = spark.createDataFrame(points, "pid long, p double")
    iv = spark.createDataFrame(intervals, "iid long, lo double, hi double")
    out = range_join(p, iv, "p", **kw)
    return {(r["pid"], r["iid"]) for r in out.collect()}


POINTS = [(i, float(v)) for i, v in enumerate([0.0, 0.5, 1.0, 2.5, 3.0, 9.9, 10.0, -1.5, 100.0])]
INTERVALS = [
    (0, 0.0, 1.0),
    (1, 0.5, 2.5),
    (2, -2.0, -1.0),
    (3, 9.0, 11.0),
    (4, 50.0, 60.0),  # matches nothing
    (5, 2.5, 2.5),    # degenerate single-point interval
]


def test_matches_bruteforce(spark):
    want = _brute(POINTS, INTERVALS)
    assert _spark_pairs(spark, POINTS, INTERVALS, bin_width=1.0) == want


@pytest.mark.parametrize("width", [0.3, 1.0, 7.5, 1000.0])
def test_bin_width_invariance(spark, width):
    """Result is a pure function of the data; width only shapes the plan."""
    rng = random.Random(7)
    pts = [(i, rng.uniform(-20, 20)) for i in range(80)]
    ivs = []
    for i in range(30):
        lo = rng.uniform(-20, 20)
        ivs.append((i, lo, lo + rng.uniform(0, 8)))
    assert _spark_pairs(spark, pts, ivs, bin_width=width) == _brute(pts, ivs)


def test_negative_points_bin_correctly(spark):
    # floor-division near zero is where sign bugs live
    pts = [(0, -0.5), (1, -1.0)]
    ivs = [(0, -1.0, -0.25)]
    assert _spark_pairs(spark, pts, ivs, bin_width=1.0) == {(0, 0), (1, 0)}


def test_invalid_width_raises(spark):
    p = spark.createDataFrame([(0, 1.0)], "pid long, p double")
    iv = spark.createDataFrame([(0, 0.0, 2.0)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="bin_width"):
        range_join(p, iv, "p", bin_width=0.0)


def test_collision_raises(spark):
    p = spark.createDataFrame([(0, 1.0)], "pid long, p double")
    iv = spark.createDataFrame([(0, 0.0, 2.0)], "pid long, lo double, hi double")
    with pytest.raises(ValueError, match="collision"):
        range_join(p, iv, "p")


def test_plan_is_hash_join_not_nested_loop(spark):
    p = spark.createDataFrame([(0, 1.0)], "pid long, p double")
    iv = spark.createDataFrame([(0, 0.0, 2.0)], "iid long, lo double, hi double")
    plan = (
        range_join(p, iv, "p", broadcast_intervals=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan

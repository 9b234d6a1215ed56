"""T56 snapshot diff (operators/snapshot.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.snapshot import diff_stats, snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string")


def test_four_statuses(spark):
    prev = _df(spark, [("a", "d1"), ("b", "d2"), ("c", "d3")])
    cur = _df(spark, [("b", "d2"), ("c", "dX"), ("d", "d4")])
    out = {r.url: r for r in snapshot_diff(prev, cur).collect()}
    assert out["a"].status == "removed" and out["a"].cur_digest is None
    assert out["b"].status == "unchanged"
    assert out["c"].status == "changed" and out["c"].cur_digest == "dX"
    assert out["d"].status == "added" and out["d"].prev_digest is None
    stats = {r.status: r.n_urls for r in diff_stats(snapshot_diff(prev, cur)).collect()}
    assert stats == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_latest_capture_wins_with_timestamps(spark):
    prev = spark.createDataFrame(
        [("a", "old", 1), ("a", "new", 2)], "url string, digest string, ts int"
    )
    cur = spark.createDataFrame(
        [("a", "new", 5)], "url string, digest string, ts int"
    )
    out = snapshot_diff(prev, cur, ts_col="ts").collect()
    assert len(out) == 1 and out[0].status == "unchanged"
    # without ts, multi-capture collapses via max(digest) — deterministic
    out2 = snapshot_diff(prev.drop("ts"), cur.drop("ts")).collect()
    assert out2[0].prev_digest == "old"  # max('new','old') lexicographic


def test_single_join_plan(spark):
    prev = _df(spark, [("a", "d1")])
    cur = _df(spark, [("a", "d1")])
    plan = (
        snapshot_diff(prev, cur)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

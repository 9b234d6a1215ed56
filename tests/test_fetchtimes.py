"""frontier/fetchtimes.py — politeness fetch-timeline assignment:
timeline arithmetic, default/null delay handling, makespan semantics,
round_start offset, and plan shape (broadcast + no new exchange)."""

from __future__ import annotations

from warcsum_spark.frontier.fetchtimes import assign_fetch_times, round_makespan

SCHED = [
    ("a.test", "http://a.test/1", 1),
    ("a.test", "http://a.test/2", 2),
    ("a.test", "http://a.test/3", 3),
    ("b.test", "http://b.test/1", 1),
    ("b.test", "http://b.test/2", 2),
    ("c.test", "http://c.test/1", 1),
]

DELAYS = [("a.test", 2.0), ("b.test", None)]  # c.test absent


def _frames(spark):
    sched = spark.createDataFrame(SCHED, "host string, url string, host_rank int")
    delays = spark.createDataFrame(DELAYS, "host string, crawl_delay double")
    return sched, delays


def test_timeline_arithmetic(spark):
    sched, delays = _frames(spark)
    got = {
        r["url"]: (r["crawl_delay"], r["fetch_at"])
        for r in assign_fetch_times(sched, delays, default_delay=0.5).collect()
    }
    assert got["http://a.test/1"] == (2.0, 0.0)
    assert got["http://a.test/3"] == (2.0, 4.0)
    # null delay and absent host both fall back to the default
    assert got["http://b.test/2"] == (0.5, 0.5)
    assert got["http://c.test/1"] == (0.5, 0.0)


def test_round_start_offset_and_no_delay_table(spark):
    sched, _ = _frames(spark)
    got = {
        r["url"]: r["fetch_at"]
        for r in assign_fetch_times(
            sched, None, default_delay=1.0, round_start=100.0
        ).collect()
    }
    assert got["http://a.test/1"] == 100.0
    assert got["http://a.test/2"] == 101.0


def test_makespan(spark):
    sched, delays = _frames(spark)
    assigned = assign_fetch_times(sched, delays, default_delay=0.5)
    got = {
        r["host"]: (r["n_urls"], r["finish_at"])
        for r in round_makespan(assigned).collect()
    }
    # a.test: last dispatch at 4.0 + 2.0 gap; b.test: 0.5 + 0.5
    assert got["a.test"] == (3, 6.0)
    assert got["b.test"] == (2, 1.0)
    assert got["c.test"] == (1, 0.5)


def test_plan_broadcast_no_new_exchange(spark):
    sched, delays = _frames(spark)
    plan = (
        assign_fetch_times(sched, delays)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan

"""T36 host budget apportionment: exact-sum property, proportionality,
caps, ties, and composition with the politeness scheduler."""

from __future__ import annotations

from warcsum_spark.frontier.budget import allocate_host_budgets


def _pending(spark, masses):
    rows = [
        (h, f"http://{h}/p/{i}", m / n)
        for h, (m, n) in masses.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "host string, url string, priority double")


def test_budgets_sum_exactly_and_are_proportional(spark):
    # masses 60 / 30 / 10 over budget 100 → exact proportional integers
    df = _pending(spark, {"a.test": (60.0, 5), "b.test": (30.0, 3), "c.test": (10.0, 2)})
    got = {
        r["host"]: r["budget"]
        for r in allocate_host_budgets(df, total_budget=100).collect()
    }
    assert got == {"a.test": 60, "b.test": 30, "c.test": 10}
    # a budget that does not divide evenly still sums exactly
    got7 = {
        r["host"]: r["budget"]
        for r in allocate_host_budgets(df, total_budget=7).collect()
    }
    assert sum(got7.values()) == 7
    assert got7["a.test"] >= got7["b.test"] >= got7["c.test"]


def test_remainder_ties_break_by_host_asc(spark):
    # two hosts with identical mass, odd budget: the extra slot goes to
    # the lexicographically smaller host — deterministic, not arbitrary
    df = _pending(spark, {"x.test": (10.0, 2), "y.test": (10.0, 2)})
    got = {
        r["host"]: r["budget"]
        for r in allocate_host_budgets(df, total_budget=5).collect()
    }
    assert got == {"x.test": 3, "y.test": 2}


def test_max_cap_applies(spark):
    df = _pending(spark, {"big.test": (99.0, 4), "small.test": (1.0, 1)})
    got = {
        r["host"]: r["budget"]
        for r in allocate_host_budgets(df, total_budget=100, max_per_host=10).collect()
    }
    assert got["big.test"] == 10  # capped
    assert got["small.test"] >= 1


def test_composes_with_politeness_scheduler(spark):
    """pagerank→budget→schedule loop: allocated budgets feed
    schedule_per_host as its politeness table and bound per-host picks."""
    from warcsum_spark.frontier.politeness import schedule_per_host

    df = _pending(spark, {"a.test": (8.0, 6), "b.test": (2.0, 6)})
    budgets = allocate_host_budgets(df, total_budget=5)
    sched = schedule_per_host(
        df, politeness=budgets.select("host", "budget"), default_budget=1
    )
    rows = sched.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    got_b = {r["host"]: r["budget"] for r in budgets.collect()}
    assert sum(got_b.values()) == 5
    for h, picked in by_host.items():
        assert len(picked) <= got_b[h]

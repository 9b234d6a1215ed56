"""T35 recrawl scheduling: change counting, interval clamps, never-
changed lane, tiebreak determinism, and due-set reproducibility."""

from __future__ import annotations

from datetime import datetime

from warcsum_spark.operators.recrawl import recrawl_schedule


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.fromisoformat(t), d, i) for i, (u, t, d) in enumerate(rows)],
        "url string, ts timestamp, digest string, event_id long",
    )


def test_change_rate_and_due(spark):
    rows = [
        # hot: changes every fetch, 2 h apart → interval clamped up to min? no:
        # span 4 h, 2 changes → 7200 s
        ("hot", "2024-01-01T00:00:00", "a"),
        ("hot", "2024-01-01T02:00:00", "b"),
        ("hot", "2024-01-01T04:00:00", "c"),
        # static: never changes → max_interval lane
        ("static", "2024-01-01T00:00:00", "x"),
        ("static", "2024-01-05T00:00:00", "x"),
        # single fetch → max_interval lane
        ("single", "2024-01-01T00:00:00", "y"),
    ]
    out = {
        r["url"]: r
        for r in recrawl_schedule(
            _hist(spark, rows),
            now="2024-01-03T00:00:00",
            min_interval_sec=3600,
            max_interval_sec=86400 * 7,
            tiebreak_col="event_id",
        ).collect()
    }
    assert out["hot"]["n_changes"] == 2
    assert out["hot"]["interval_sec"] == 7200
    assert out["hot"]["due"]  # last fetch Jan 1 + 2 h << Jan 3
    assert out["static"]["n_changes"] == 0
    assert out["static"]["interval_sec"] == 86400 * 7
    assert not out["static"]["due"]
    assert out["single"]["n_fetches"] == 1
    assert out["single"]["interval_sec"] == 86400 * 7


def test_min_interval_clamp(spark):
    # changes every second → raw interval 1 s, clamped to min
    rows = [(f"u", f"2024-01-01T00:00:0{i}", f"d{i}") for i in range(5)]
    out = recrawl_schedule(
        _hist(spark, rows), now="2024-01-01T01:00:00", min_interval_sec=600,
        tiebreak_col="event_id",
    ).collect()[0]
    assert out["n_changes"] == 4
    assert out["interval_sec"] == 600


def test_tiebreak_makes_same_ts_order_deterministic(spark):
    """Two fetches at the SAME timestamp: the event-id tiebreak fixes
    which digest counts as 'previous' — result invariant under
    repartitioning."""
    rows = [
        ("u", "2024-01-01T00:00:00", "a"),
        ("u", "2024-01-01T00:00:00", "b"),  # same ts, later event_id
        ("u", "2024-01-02T00:00:00", "b"),
    ]
    df = _hist(spark, rows)
    n1 = recrawl_schedule(
        df, now="2024-01-03T00:00:00", tiebreak_col="event_id"
    ).collect()[0]["n_changes"]
    n2 = recrawl_schedule(
        df.repartition(7), now="2024-01-03T00:00:00", tiebreak_col="event_id"
    ).collect()[0]["n_changes"]
    assert n1 == n2 == 1  # a→b counts once; b→b does not


def test_single_exchange_plan(spark):
    """Window and aggregation share the url key: exactly one url-keyed
    exchange in the plan."""
    df = _hist(spark, [("u", "2024-01-01T00:00:00", "a")])
    plan = (
        recrawl_schedule(df, now="2024-01-02T00:00:00", tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_url_exchanges = sum(
        1
        for seg in plan.splitlines()
        if "Exchange hashpartitioning(url" in seg
    )
    assert n_url_exchanges == 1, plan

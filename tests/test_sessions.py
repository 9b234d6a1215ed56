"""Sessionization operator: hand-computed semantics + single-exchange plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from warcsum_spark.operators.sessions import session_stats, sessionize


def _events(spark):
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)

    def at(minutes, eid, uid, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, val)

    rows = [
        # user 1: two sessions (gap 31 min > 30)
        at(0, 1, 1, 1.0),
        at(10, 2, 1, 2.0),
        at(41, 3, 1, 3.0),
        # user 2: one session, boundary-exact 30-min gap does NOT split
        at(0, 4, 2, 1.0),
        at(30, 5, 2, 1.0),
        # user 3: singleton
        at(5, 6, 3, 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_sessionize_semantics(spark):
    got = {
        r["event_id"]: r["session_no"]
        for r in sessionize(_events(spark), gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1}


def test_session_stats(spark):
    rows = {
        (r["user_id"], r["session_no"]): r
        for r in session_stats(_events(spark), gap_seconds=1800).collect()
    }
    s11 = rows[(1, 1)]
    assert s11["n_events"] == 2 and s11["duration_sec"] == 600
    assert rows[(1, 2)]["n_events"] == 1 and rows[(1, 2)]["duration_sec"] == 0
    assert rows[(2, 1)]["n_events"] == 2 and rows[(2, 1)]["duration_sec"] == 1800
    assert rows[(3, 1)]["sum_value"] == 7.0


def test_sessionize_single_exchange(spark):
    """lag + running sum + session aggregate must share ONE hash exchange
    on the key — the operator's 100 TB contract (sessions.py docstring)."""
    plan = (
        session_stats(_events(spark), gap_seconds=1800)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 exchange, got {n}:\n{plan[:3000]}"

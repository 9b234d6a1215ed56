"""operators/recrawl.py::change_rate_mle (T96) — the Cho &
Garcia-Molina bias-corrected Poisson estimator: a pure-Python twin,
the bias-correction property itself (corrected ≥ naive, finite at
X=n), degenerate-history NULLs, tiebreak determinism, and the
Python-free plan contract."""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import pytest

from warcsum_spark.operators.recrawl import change_rate_mle


def _ts(i: int) -> datetime:
    return datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(hours=i)


def _py_ref(fetches):
    # fetches: [(ts_hours, digest)] sorted
    n = len(fetches) - 1
    x = sum(
        1
        for i in range(1, len(fetches))
        if fetches[i][1] != fetches[i - 1][1]
    )
    span = (fetches[-1][0] - fetches[0][0]) * 3600
    if n <= 0 or span <= 0:
        return None
    iv = span / n
    neg_ln = -math.log((n - x + 0.5) / (n + 0.5))
    return {
        "n_obs": n,
        "n_changes": x,
        "avg_interval_sec": round(iv, 3),
        "lambda_per_day": round(neg_ln / iv * 86400.0, 6),
        "change_interval_sec": round(iv / neg_ln, 3) if x > 0 else None,
    }


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, ts timestamp, digest string, event_id long"
    )
    return {
        r["url"]: r.asDict()
        for r in change_rate_mle(df, tiebreak_col="event_id").collect()
    }


def test_python_reference_twin(spark):
    histories = {
        "hot": [(i, f"v{i}") for i in range(10)],  # changes every fetch
        "cold": [(i, "same") for i in range(10)],  # never changes
        "mixed": [(0, "a"), (5, "a"), (9, "b"), (14, "b"), (20, "c")],
    }
    rows = [
        (url, _ts(h), d, i)
        for url, fs in histories.items()
        for i, (h, d) in enumerate(fs)
    ]
    out = _run(spark, rows)
    for url, fs in histories.items():
        ref = _py_ref(fs)
        got = out[url]
        for k, v in ref.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=1e-6), (url, k)
            else:
                assert got[k] == v, (url, k)


def test_finite_at_all_changed_and_exceeds_naive(spark):
    # X = n: naive rate = 1 change/interval; the corrected estimator is
    # FINITE and strictly larger (it accounts for unseen changes)
    fs = [(i, f"v{i}") for i in range(6)]  # n=5, X=5, I=3600s
    out = _run(spark, [("u", _ts(h), d, i) for i, (h, d) in enumerate(fs)])
    lam = out["u"]["lambda_per_day"]
    naive_per_day = 86400.0 / 3600.0  # one change per hour
    assert lam is not None and math.isfinite(lam)
    assert lam > naive_per_day


def test_cold_page_rate_near_zero_no_expectation(spark):
    fs = [(i, "same") for i in range(6)]
    out = _run(spark, [("u", _ts(h), d, i) for i, (h, d) in enumerate(fs)])
    # (n-0+0.5)/(n+0.5) = 1 → -ln(1) = 0: zero observed changes
    # estimate rate exactly 0
    assert out["u"]["lambda_per_day"] == 0.0
    assert out["u"]["change_interval_sec"] is None  # X=0: no claim


def test_degenerate_histories_are_null(spark):
    rows = [
        ("single", _ts(0), "a", 0),
        ("zerospan", _ts(0), "a", 0),
        ("zerospan", _ts(0), "b", 1),
    ]
    out = _run(spark, rows)
    for u in ("single", "zerospan"):
        assert out[u]["lambda_per_day"] is None, u
        assert out[u]["avg_interval_sec"] is None, u


def test_tiebreak_makes_same_ts_order_deterministic(spark):
    # two fetches at the identical timestamp: event_id orders them
    rows = [
        ("u", _ts(0), "a", 0),
        ("u", _ts(1), "b", 2),
        ("u", _ts(1), "a", 1),  # between a and b by event_id
        ("u", _ts(2), "b", 3),
    ]
    out = _run(spark, rows)
    # order a,a,b,b → exactly ONE change
    assert out["u"]["n_changes"] == 1


def test_plan_python_free(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), "a", 0)],
        "url string, ts timestamp, digest string, event_id long",
    )
    plan = (
        change_rate_mle(df, tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

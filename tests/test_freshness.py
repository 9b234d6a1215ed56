"""operators/freshness.py (T108) — Cho & Garcia-Molina policy scoring:
the closed forms re-derived by numeric integration, the lambda=I=1
hand pin (F = 1-1/e, A = F-1/2), the uniform-beats-proportional
theorem on heterogeneous rates (TODS 2003 Thm 4.1), the
equal-rate degenerate case where the two policies coincide, static
pages pinned (F=1, A=0), the Taylor/direct branch seam, budget
monotonicity, bit-equal partitioning invariance, DuckDB twin parity,
composition with T96's estimator, and the Python-free plan."""

from __future__ import annotations

import math

import duckdb
import pytest

from warcsum_spark.operators.freshness import (
    freshness_policy,
    freshness_policy_sql,
)


def _f_closed(r):
    if r < 0.01:
        return 1.0 - r / 2.0 + r * r / 6.0 - r * r * r / 24.0
    return (1.0 - math.exp(-r)) / r


def _a_closed(r, i):
    if r < 0.01:
        return i * (r / 6.0 - r * r / 24.0 + r * r * r / 120.0)
    return i * (0.5 - 1.0 / r + (1.0 - math.exp(-r)) / (r * r))


def _py_ref(lams, budget):
    lams = [l if (l is not None and l > 0) else 0.0 for l in lams]
    n = len(lams)
    s = round(sum(round(l, 6) for l in lams), 6)
    out = {}
    for strat in ("uniform", "proportional"):
        fs, as_ = [], []
        for l in lams:
            if l <= 0:
                fs.append(1.0)
                as_.append(0.0)
                continue
            i = n / budget if strat == "uniform" else s / budget / l
            r = l * i
            fs.append(round(_f_closed(r), 6))
            as_.append(round(_a_closed(r, i), 6))
        out[strat] = {
            "strategy": strat,
            "n_pages": n,
            "n_changing": sum(1 for l in lams if l > 0),
            "budget_per_day": budget,
            "avg_freshness": round(sum(fs) / n, 6),
            "avg_age_days": round(sum(as_) / n, 6),
        }
    return out


def _run(spark, lams, budget):
    df = spark.createDataFrame(
        [(l,) for l in lams], "lambda_per_day double"
    )
    rows = freshness_policy(df, budget).collect()
    return {r["strategy"]: r.asDict() for r in rows}


def _check(spark, lams, budget):
    got = _run(spark, lams, budget)
    ref = _py_ref(lams, budget)
    assert set(got) == {"uniform", "proportional"}
    for strat in ref:
        for k, v in ref[strat].items():
            g = got[strat][k]
            if isinstance(v, float):
                assert g == pytest.approx(v, abs=2e-6), (strat, k)
            else:
                assert g == v, (strat, k)
    return got


def test_closed_forms_match_numeric_integration():
    # F = (1/I) int_0^I e^{-lt} dt ; A = (1/I) int_0^I (t - (1-e^{-lt})/l) dt
    for lam, i in [(1.0, 1.0), (0.25, 3.0), (4.0, 0.5), (0.002, 2.0)]:
        n = 200_000
        dt = i / n
        f_num = sum(math.exp(-lam * (k + 0.5) * dt) for k in range(n)) * dt / i
        a_num = (
            sum(
                (k + 0.5) * dt - (1 - math.exp(-lam * (k + 0.5) * dt)) / lam
                for k in range(n)
            )
            * dt
            / i
        )
        r = lam * i
        assert _f_closed(r) == pytest.approx(f_num, abs=1e-6)
        assert _a_closed(r, i) == pytest.approx(a_num, abs=1e-6)


def test_hand_pin_unit_rate_unit_interval(spark):
    # one page, lambda = 1/day, budget 1/day -> I = 1, r = 1:
    # F = 1 - 1/e = 0.632121 ; A = 1/2 - 1 + (1 - 1/e) = F - 1/2
    got = _run(spark, [1.0], 1.0)
    for strat in ("uniform", "proportional"):
        assert got[strat]["avg_freshness"] == pytest.approx(
            1 - 1 / math.e, abs=1e-6
        )
        assert got[strat]["avg_age_days"] == pytest.approx(
            (1 - 1 / math.e) - 0.5, abs=1e-6
        )


def test_uniform_beats_proportional_on_freshness(spark):
    # the TODS 2003 Thm 4.1 pin: heterogeneous rates, same budget
    lams = [8.0] * 3 + [0.5] * 17
    got = _check(spark, lams, 10.0)
    assert (
        got["uniform"]["avg_freshness"]
        > got["proportional"]["avg_freshness"]
    )


def test_equal_rates_policies_coincide(spark):
    got = _check(spark, [0.7] * 12, 6.0)
    assert got["uniform"]["avg_freshness"] == pytest.approx(
        got["proportional"]["avg_freshness"], abs=2e-6
    )
    assert got["uniform"]["avg_age_days"] == pytest.approx(
        got["proportional"]["avg_age_days"], abs=2e-6
    )


def test_static_pages_pinned_and_budget_free(spark):
    # all-static corpus: perfectly fresh, zero age, under any budget
    got = _check(spark, [0.0, None, 0.0], 5.0)
    for strat in ("uniform", "proportional"):
        assert got[strat]["avg_freshness"] == 1.0
        assert got[strat]["avg_age_days"] == 0.0
        assert got[strat]["n_changing"] == 0
    # mixed: statics lift the average exactly by their pinned F = 1
    mixed = _check(spark, [2.0, 0.0, 0.0, 0.0], 4.0)
    assert mixed["uniform"]["n_changing"] == 1


def test_taylor_branch_seam(spark):
    # rates straddling r = 0.01 under uniform I = 1: the branch seam
    _check(spark, [0.0099, 0.0101, 0.00001, 0.5], 4.0)


def test_more_budget_more_freshness(spark):
    lams = [1.0, 3.0, 0.2, 7.0]
    lo = _run(spark, lams, 2.0)
    hi = _run(spark, lams, 20.0)
    for strat in ("uniform", "proportional"):
        assert hi[strat]["avg_freshness"] > lo[strat]["avg_freshness"]
        assert hi[strat]["avg_age_days"] < lo[strat]["avg_age_days"]


def test_partitioning_invariance_bit_equal(spark):
    lams = [round((i % 37) * 0.21 + 0.01, 6) for i in range(200)]
    df = spark.createDataFrame([(l,) for l in lams], "lambda_per_day double")
    a = sorted(map(tuple, freshness_policy(df.repartition(1), 9.0).collect()))
    b = sorted(map(tuple, freshness_policy(df.repartition(17), 9.0).collect()))
    assert a == b


def test_duckdb_twin_bit_parity(spark):
    lams = [round((i % 23) * 0.37 + (0.0 if i % 5 else 0.001), 6)
            for i in range(150)] + [0.0, None]
    got = _run(spark, lams, 11.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE R (lambda_per_day DOUBLE)")
    con.executemany(
        "INSERT INTO R VALUES (?)", [(l,) for l in lams]
    )
    sql = freshness_policy_sql("SELECT lambda_per_day FROM R", 11.0)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        g = got[d["strategy"]]
        for k, v in d.items():
            assert g[k] == v, (d["strategy"], k, g[k], v)


def test_composes_with_change_rate_mle(spark):
    from warcsum_spark.operators.recrawl import change_rate_mle

    import datetime as dt

    def day(d):
        return dt.datetime(2024, 1, d)

    hist = spark.createDataFrame(
        [("u1", day(d), f"d{d % 2}", d) for d in range(1, 11)]
        + [("u2", day(d), "same", d) for d in range(1, 6)],
        "url string, ts timestamp, digest string, event_id long",
    )
    rates = change_rate_mle(hist, tiebreak_col="event_id")
    rows = freshness_policy(rates, 4.0).collect()
    got = {r["strategy"]: r.asDict() for r in rows}
    assert got["uniform"]["n_pages"] == 2
    assert got["uniform"]["n_changing"] == 1  # u2 never changed
    assert 0 < got["uniform"]["avg_freshness"] <= 1


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([(1.0,)], "lambda_per_day double")
    plan = (
        freshness_policy(df, 2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

"""operators/powerlaw.py (T117) — Clauset–Shalizi–Newman power-law
fit: a pure-Python twin (same scaled-integer sums and pinned IEEE
expressions), exponent recovery on an inverse-CDF power-law sample,
the non-power-law KS contrast, xmin filtering, degenerate tails,
duplicate-edge collapse in the in-degree wrapper, partitioning
invariance, and DuckDB twin parity."""

from __future__ import annotations

import math

import duckdb
import pytest

from warcsum_spark.operators.powerlaw import (
    SCALE,
    indegree_powerlaw,
    indegree_powerlaw_sql,
    powerlaw_fit,
    powerlaw_sql,
)


def _py_ref(values, xmin=1):
    half = xmin - 0.5
    tail = sorted(v for v in values if v >= xmin)
    n = len(tail)
    if n < 2:
        return (n, xmin, None, None, None)
    s = sum(int(round(math.log(v / half) * SCALE)) for v in tail)
    alpha = 1.0 + n / (s / float(SCALE))
    sigma = (alpha - 1.0) / math.sqrt(n)
    hist = {}
    for v in tail:
        hist[v] = hist.get(v, 0) + 1
    cum, ks = 0, 0.0
    for d in sorted(hist):
        cum += hist[d]
        p = 1.0 - ((d + 0.5) / half) ** (1.0 - alpha)
        ks = max(ks, abs(cum / n - p))
    return (n, xmin, round(alpha, 6), round(sigma, 6), round(ks, 6))


def _run(spark, values, xmin=1):
    df = spark.createDataFrame([(int(v),) for v in values], "value long")
    r = powerlaw_fit(df, "value", xmin).collect()[0]
    return (r["n_tail"], r["xmin"], r["alpha"], r["sigma"], r["ks_stat"])


def _powerlaw_sample(alpha=2.5, n=2000, xmin=1):
    # deterministic inverse-CDF draw on a rational u grid using the
    # paper's discrete generator (Clauset et al. eq. D.6) — matched to
    # the continuous-at-half-integers estimator
    out = []
    for i in range(n):
        u = (i + 0.5) / n
        x = (xmin - 0.5) * (1.0 - u) ** (-1.0 / (alpha - 1.0)) + 0.5
        out.append(int(math.floor(x)))
    return out


def test_python_twin(spark):
    vals = _powerlaw_sample()
    assert _run(spark, vals) == _py_ref(vals)


def test_exponent_recovery(spark):
    # the continuous-at-half-integers approximation is accurate for
    # xmin >~ 6 (Clauset et al. §3.2) — sample and fit there
    got = _run(spark, _powerlaw_sample(alpha=2.5, n=2000, xmin=6), xmin=6)
    assert got[2] == pytest.approx(2.5, abs=0.1)
    assert got[4] < 0.05  # a true power law fits tightly


def test_uniform_sample_is_a_bad_fit(spark):
    # uniform degrees 6..55: KS far worse than the power law's
    vals = list(range(6, 56)) * 40
    got = _run(spark, vals, xmin=6)
    assert got[4] > 0.15
    pl = _run(spark, _powerlaw_sample(alpha=2.5, n=2000, xmin=6), xmin=6)
    assert pl[4] < got[4]


def test_xmin_filters_head(spark):
    vals = _powerlaw_sample(n=500) + [1] * 100
    full = _run(spark, vals, xmin=1)
    tail = _run(spark, vals, xmin=3)
    assert tail[0] < full[0]
    assert tail == _py_ref(vals, xmin=3)


def test_degenerate_tail_yields_nulls(spark):
    assert _run(spark, [5]) == (1, 1, None, None, None)
    assert _run(spark, []) == (0, 1, None, None, None)


def test_bad_xmin_raises(spark):
    df = spark.createDataFrame([(1,)], "value long")
    with pytest.raises(ValueError, match="xmin"):
        powerlaw_fit(df, "value", 0)


def test_partitioning_invariance_bit_equal(spark):
    vals = _powerlaw_sample(n=1000)
    df = spark.createDataFrame([(int(v),) for v in vals], "value long")
    a = powerlaw_fit(df.repartition(1), "value").collect()
    b = powerlaw_fit(df.repartition(13), "value").collect()
    assert a == b


def test_indegree_wrapper_collapses_duplicates(spark):
    edges = [(0, 1), (0, 1), (2, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = indegree_powerlaw(df).collect()[0]
    # structural in-degrees: {1: 2, 4: 1} -> n_tail 2
    assert got["n_tail"] == 2
    ref = _py_ref([2, 1])
    assert (
        got["n_tail"], got["xmin"], got["alpha"], got["sigma"],
        got["ks_stat"],
    ) == ref


def test_duckdb_twin_bit_parity(spark):
    vals = _powerlaw_sample(alpha=2.2, n=700)
    got = _run(spark, vals, xmin=2)
    con = duckdb.connect()
    con.execute("CREATE TABLE V (value BIGINT)")
    con.executemany("INSERT INTO V VALUES (?)", [(v,) for v in vals])
    row = con.execute(
        powerlaw_sql("SELECT value FROM V", "value", xmin=2)
    ).fetchone()
    assert row == got

    edges = [((i * 3) % 40, (i * i) % 25) for i in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g2 = indegree_powerlaw(df, xmin=1).collect()[0]
    con.execute("CREATE TABLE E2 (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO E2 VALUES (?, ?)", edges)
    row2 = con.execute(
        indegree_powerlaw_sql("SELECT src, dst FROM E2", xmin=1)
    ).fetchone()
    assert row2 == (
        g2["n_tail"], g2["xmin"], g2["alpha"], g2["sigma"], g2["ks_stat"]
    )

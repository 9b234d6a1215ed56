"""operators/urlspam.py (T119) — Fetterly URL-shape spam signals: an
independent Python twin of the pinned scaled-integer z-score
arithmetic, the zero-variance pin, an engineered outlier flag, the
digit/depth feature definitions, partitioning invariance, parameter
validation, DuckDB twin parity, and a Python-free plan."""

from __future__ import annotations

import math

import duckdb
import pytest

from warcsum_spark.operators.urlspam import (
    url_spam_oracle_sql,
    url_spam_signals,
)


def _py_ref(rows, z_thresh=2.0):
    """Pure-Python replica of the pinned arithmetic: integer feature
    sums per host, 1e6-scaled quantization, exact-integer z's."""
    agg = {}
    for host, url in rows:
        n, sl, sd, sp = agg.get(host, (0, 0, 0, 0))
        agg[host] = (
            n + 1,
            sl + len(url),
            sd + sum(c.isdigit() for c in url),
            sp + url.count("/") - 2,
        )
    scaled = {}
    for host, (n, sl, sd, sp) in agg.items():
        feats = (
            sl / n,
            (sd / sl) if sl > 0 else 0.0,
            sp / n,
        )
        scaled[host] = (
            n,
            tuple(round(f, 6) for f in feats),
            # round-half-away-from-zero on non-negative values == the
            # engines' round(); python round() is banker's — emulate
            tuple(math.floor(f * 1e6 + 0.5) for f in feats),
        )
    nh = len(scaled)
    sums = [sum(s[2][i] for s in scaled.values()) for i in range(3)]
    qs = [sum(s[2][i] ** 2 for s in scaled.values()) for i in range(3)]
    out = {}
    for host, (n, feats, svals) in scaled.items():
        zs = []
        for i in range(3):
            var = nh * qs[i] - sums[i] * sums[i]
            zs.append(
                round((nh * svals[i] - sums[i]) / math.sqrt(var), 6)
                if var > 0
                else 0.0
            )
        out[host] = (
            n,
            *feats,
            *zs,
            any(abs(z) > z_thresh for z in zs),
        )
    return out


def _run(spark, rows, z_thresh=2.0):
    df = spark.createDataFrame(rows, "host string, url string")
    res = url_spam_signals(df, z_thresh=z_thresh)
    return {r["host"]: tuple(r)[1:] for r in res.collect()}


def _corpus():
    rows = []
    for h in range(10):
        for i in range(20):
            rows.append(
                (f"h{h}.test", f"http://h{h}.test/p/{(h * 20 + i) % 100}")
            )
    # the outlier: long, digit-dense, deep machine-generated paths
    for i in range(20):
        rows.append(
            (
                "spam.test",
                f"http://spam.test/{i * 7919}/{i * 104729}/x{i % 97}/y{i}",
            )
        )
    return rows


def test_python_twin(spark):
    rows = _corpus()
    got = _run(spark, rows)
    assert got == _py_ref(rows)


def test_outlier_flagged_and_normals_not(spark):
    got = _run(spark, _corpus())
    assert got["spam.test"][-1] is True
    flagged = [h for h, v in got.items() if v[-1]]
    assert flagged == ["spam.test"]
    # the spam host is an outlier on every feature
    assert got["spam.test"][4] > 2.0  # z_len
    assert got["spam.test"][5] > 2.0  # z_digit
    assert got["spam.test"][6] > 2.0  # z_depth


def test_zero_variance_pins_zero(spark):
    rows = [(f"h{h}.test", f"http://h{h}.test/p/1") for h in range(5)]
    got = _run(spark, rows)
    # hostnames h0..h4 are same length → identical features everywhere
    for v in got.values():
        assert v[4] == v[5] == v[6] == 0.0 and v[-1] is False


def test_feature_definitions(spark):
    got = _run(spark, [("a.test", "http://a.test/p1/22x/")])
    n, mean_len, digit_share, mean_depth = got["a.test"][:4]
    url = "http://a.test/p1/22x/"
    assert n == 1
    assert mean_len == float(len(url))
    assert digit_share == round(3 / len(url), 6)
    assert mean_depth == 3.0  # '/' count 5 minus the scheme's 2


def test_partitioning_invariance(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "host string, url string")
    a = sorted(map(tuple, url_spam_signals(df).collect()))
    b = sorted(map(tuple, url_spam_signals(df.repartition(7)).collect()))
    assert a == b


def test_z_thresh_validation(spark):
    df = spark.createDataFrame([("a", "http://a/x")], "host string, url string")
    with pytest.raises(ValueError, match="z_thresh"):
        url_spam_signals(df, z_thresh=0)


def test_duckdb_twin_parity(spark):
    rows = _corpus()
    urls_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"('{h}', '{u}')" for h, u in rows
    ) + ") AS t(host, url)"
    ora = {
        r[0]: tuple(r)[1:]
        for r in duckdb.sql(url_spam_oracle_sql(urls_sql)).fetchall()
    }
    assert _run(spark, rows) == ora


def test_plan_is_python_free(spark):
    df = spark.createDataFrame(
        [("a", "http://a/x1"), ("b", "http://b/y22")],
        "host string, url string",
    )
    plan = (
        url_spam_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

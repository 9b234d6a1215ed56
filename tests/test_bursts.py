"""operators/bursts.py (T120) — Kleinberg burst detection: engine
summaries vs the independent scalar-loop reference trajectory,
engineered burst hand pins, the degenerate pins (<2 events, all-equal
timestamps, uniform cadence), gamma sensitivity, the timestamp-type
paths, parameter validation, partitioning invariance, and DuckDB
gaps-and-islands twin parity over materialized reference states."""

from __future__ import annotations

import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from warcsum_spark.operators.bursts import burst_oracle_sql, kleinberg_bursts
from warcsum_spark.oracle_refs import ref_burst_states

US = 1_000_000


def _summarize(states):
    states = list(states)
    n_bursts = burst_gaps = max_run = run = 0
    prev = 0
    for s in states:
        if s == 1:
            burst_gaps += 1
            run += 1
            if prev == 0:
                n_bursts += 1
            max_run = max(max_run, run)
        else:
            run = 0
        prev = s
    return n_bursts, burst_gaps, max_run


def _ts_from_gaps(gaps, start=0):
    ts = [start]
    for g in gaps:
        ts.append(ts[-1] + g)
    return ts


def _hosts():
    """host → epoch-µs lists: a clear mid-series burst, uniform
    cadence, a single event, an all-simultaneous pin, and a noisy
    normal host."""
    return {
        "bursty": _ts_from_gaps([10 * US] * 10 + [US // 10] * 8 + [10 * US] * 10),
        "uniform": _ts_from_gaps([5 * US] * 25),
        "lonely": [42],
        "frozen": [7 * US] * 6,
        "noisy": _ts_from_gaps(
            [(3 + (i * 7) % 5) * US for i in range(30)]
        ),
    }


def _run(spark, hosts, s=2.0, gamma=1.0):
    rows = [(h, t) for h, ts in hosts.items() for t in ts]
    df = spark.createDataFrame(rows, "host string, ts long")
    res = kleinberg_bursts(df, s=s, gamma=gamma)
    return {r["host"]: tuple(r)[1:] for r in res.collect()}


def _ref(hosts, s=2.0, gamma=1.0):
    out = {}
    for h, ts in hosts.items():
        states = ref_burst_states(ts, s=s, gamma=gamma)
        out[h] = (len(ts), max(len(ts) - 1, 0), *_summarize(states))
    return out


def test_reference_twin(spark):
    hosts = _hosts()
    assert _run(spark, hosts) == _ref(hosts)


def test_burst_hand_pin(spark):
    got = _run(spark, _hosts())
    n_events, n_gaps, n_bursts, burst_gaps, max_run = got["bursty"]
    assert (n_events, n_gaps) == (29, 28)
    assert n_bursts == 1 and burst_gaps == 8 and max_run == 8
    # and the reference agrees the burst covers exactly the fast gaps
    states = ref_burst_states(_hosts()["bursty"])
    assert states == [0] * 10 + [1] * 8 + [0] * 10


def test_degenerate_pins(spark):
    got = _run(spark, _hosts())
    assert got["lonely"] == (1, 0, 0, 0, 0)
    assert got["frozen"] == (6, 5, 0, 0, 0)  # Σx = 0 pin
    assert got["uniform"] == (26, 25, 0, 0, 0)


def test_gamma_sensitivity(spark):
    hosts = {"h": _hosts()["bursty"]}
    cheap = _run(spark, hosts, gamma=0.1)["h"][2]
    dear = _run(spark, hosts, gamma=5.0)["h"][2]
    assert cheap >= 1 and dear == 0  # ln(29)·5 ≈ 16.8 > the 8-gap saving


def test_timestamp_ntz_path(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("h", base + datetime.timedelta(microseconds=t))
        for t in _hosts()["bursty"]
    ]
    df = spark.createDataFrame(rows, "host string, ts timestamp_ntz")
    got = {r["host"]: tuple(r)[1:] for r in kleinberg_bursts(df).collect()}
    assert got["h"] == _run(spark, {"h": _hosts()["bursty"]})["h"]


def test_param_validation(spark):
    df = spark.createDataFrame([("h", 0)], "host string, ts long")
    with pytest.raises(ValueError, match="s must"):
        kleinberg_bursts(df, s=1.0)
    with pytest.raises(ValueError, match="gamma"):
        kleinberg_bursts(df, gamma=0)


def test_partitioning_invariance(spark):
    rows = [(h, t) for h, ts in _hosts().items() for t in ts]
    df = spark.createDataFrame(rows, "host string, ts long")
    a = sorted(map(tuple, kleinberg_bursts(df).collect()))
    b = sorted(map(tuple, kleinberg_bursts(df.repartition(7)).collect()))
    assert a == b


def test_duckdb_twin_parity(spark, tmp_path):
    hosts = _hosts()
    s_rows, h_rows = [], []
    for h, ts in sorted(hosts.items()):
        states = ref_burst_states(ts)
        h_rows.append((h, len(ts), max(len(ts) - 1, 0)))
        s_rows.extend((h, i, st) for i, st in enumerate(states))
    states_path = str(tmp_path / "states.parquet")
    hosts_path = str(tmp_path / "hosts.parquet")
    pq.write_table(
        pa.table(
            {
                "host": [r[0] for r in s_rows],
                "idx": pa.array([r[1] for r in s_rows], pa.int64()),
                "state": pa.array([r[2] for r in s_rows], pa.int64()),
            }
        ),
        states_path,
    )
    pq.write_table(
        pa.table(
            {
                "host": [r[0] for r in h_rows],
                "n_events": pa.array([r[1] for r in h_rows], pa.int64()),
                "n_gaps": pa.array([r[2] for r in h_rows], pa.int64()),
            }
        ),
        hosts_path,
    )
    ora = {
        r[0]: tuple(r)[1:]
        for r in duckdb.sql(
            burst_oracle_sql(states_path, hosts_path)
        ).fetchall()
    }
    assert _run(spark, hosts) == ora

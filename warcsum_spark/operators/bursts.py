"""T120 — Kleinberg burst detection over per-host event streams
(Kleinberg, "Bursty and hierarchical structure in streams", KDD 2002
— the standard 2-state automaton: a base-rate state q0 and a burst
state q1 emitting inter-arrival gaps from exponential densities
f_i(x) = α_i·e^(−α_i·x) with α1 = s·α0, a transition cost γ·ln(m+1)
for entering the burst state, and the minimum-cost state sequence via
the Viterbi recurrence).

Why a crawler wants it: a host whose request stream (or change
stream) BURSTS is news breaking, a link farm spinning up, or a trap
minting URLs — T96's Poisson MLE assumes a constant rate and reports
one number; this finds the rate SHIFTS and when. Burst counts feed
T108's revisit policy (bursty hosts get freshness budget) and T38's
trap triage (a thousand-gap burst run at machine cadence is not
news).

Pinned DP (the discipline both independent implementations follow —
all-INTEGER outputs, so the gate is exact, and the float trajectory
is round-9 pinned at every step so an ulp of libm drift cannot flip
an argmin):

* gaps x_j = ts_{j+1} − ts_j in integer MICROSECONDS (epoch-µs),
  ascending sort, m = #gaps ≥ 1 (hosts with < 2 events emit zeros);
* α0 = m / Σx (one IEEE division of exact integers), α1 = s·α0;
  Σx = 0 (all events simultaneous) pins all states to 0;
* c_i(x) = round(α_i·x − L_i, 9) with L_i = round(ln α_i, 9) (the ln
  terms quantized before use); trans = round(γ·ln(m+1), 9);
* d0' = round(min(d0, d1) + c0, 9), d1' = round(min(d0 + trans, d1)
  + c1, 9), started in state 0 (d = [c0(x_0), trans + c1(x_0)]);
  every tie prefers the LOWER state (≤ comparisons throughout,
  backtrack and final argmin included);
* outputs per host: n_events, n_gaps, n_bursts (maximal runs of
  state 1), burst_gaps (gaps labeled 1), max_run (longest run).

Plan shape at 100 TB: ONE corpus-grain exchange (groupBy host,
collect sorted epoch-µs); the DP is inherently sequential in t but
VECTORIZED ACROSS HOSTS inside the Arrow kernel (hosts × gaps
matrix, one numpy step per gap index over all hosts in the batch) —
per-batch Python iterations = max gaps per host, not Σ. Per-host
arrays are bounded by per-host event counts (the politeness /
fetch-time tables' working assumption); production windows the
stream by epoch before calling this, which also matches the paper's
hierarchical decomposition.

The DuckDB oracle aggregates the INDEPENDENT per-gap reference
states (oracle_refs.ref_burst_states — per-host scalar loop, the
opposite code shape — materialized to parquet) with a plain
gaps-and-islands SQL, so the DP trajectory AND the engine's run
summarization are cross-checked separately.

No reference counterpart (warcsum has no temporal layer); §2.12
crawl-dynamics tier, sibling of T96/T108/T38.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _burst_summaries(s: float, gamma: float):
    """Arrow kernel: Series[list[int µs]] → Series[list[5 ints]] —
    the host-axis-vectorized pinned DP of the module docstring."""

    @pandas_udf("array<long>")
    def kernel(ts_lists: pd.Series) -> pd.Series:
        arrs = [np.asarray(v, dtype=np.int64) for v in ts_lists]
        gaps = [np.diff(a) if a.size >= 2 else np.empty(0, np.int64) for a in arrs]
        m = np.array([g.size for g in gaps], dtype=np.int64)
        tot = np.array([int(g.sum()) for g in gaps], dtype=np.int64)
        live = (m >= 1) & (tot > 0)
        H = len(arrs)
        out = [[int(a.size), int(mm), 0, 0, 0] for a, mm in zip(arrs, m)]
        if not live.any():
            return pd.Series(out)
        idx = np.nonzero(live)[0]
        a0 = m[idx].astype(np.float64) / tot[idx].astype(np.float64)
        a1 = s * a0
        # the ln terms are round-9 quantized BEFORE use: numpy's array
        # log and a scalar log may differ by an ulp (SIMD vs scalar
        # libm paths) — quantizing here confines that hazard to one
        # measure-zero boundary per host instead of one per gap
        ln0 = np.round(np.log(a0), 9)
        ln1 = np.round(np.log(a1), 9)
        trans = np.round(gamma * np.log(m[idx].astype(np.float64) + 1.0), 9)
        tmax = int(m[idx].max())
        # pad gaps to (live hosts × tmax); padded steps are masked out
        gx = np.zeros((idx.size, tmax), dtype=np.float64)
        for r, i in enumerate(idx):
            gx[r, : m[i]] = gaps[i]
        mlive = m[idx]
        c0 = np.round(a0[:, None] * gx - ln0[:, None], 9)
        c1 = np.round(a1[:, None] * gx - ln1[:, None], 9)
        d0 = np.round(c0[:, 0], 9)
        d1 = np.round(trans + c1[:, 0], 9)
        # ptr[t, r, q] = previous state chosen entering state q at t
        ptr = np.zeros((tmax, idx.size, 2), dtype=np.int8)
        for t in range(1, tmax):
            from0_0 = d0 <= d1                   # tie → lower state
            from0_1 = (d0 + trans) <= d1
            nd0 = np.round(np.where(from0_0, d0, d1) + c0[:, t], 9)
            nd1 = np.round(np.where(from0_1, d0 + trans, d1) + c1[:, t], 9)
            active = t < mlive
            ptr[t, :, 0] = np.where(from0_0, 0, 1)
            ptr[t, :, 1] = np.where(from0_1, 0, 1)
            d0 = np.where(active, nd0, d0)
            d1 = np.where(active, nd1, d1)
        for r, i in enumerate(idx):
            mm = int(mlive[r])
            st = 0 if d0[r] <= d1[r] else 1
            states = np.empty(mm, dtype=np.int8)
            states[mm - 1] = st
            for t in range(mm - 1, 0, -1):
                st = int(ptr[t, r, st])
                states[t - 1] = st
            ones = states == 1
            burst_gaps = int(ones.sum())
            if burst_gaps:
                # run-length encode the 1-runs
                edges = np.diff(np.concatenate(([0], ones.view(np.int8), [0])))
                starts = np.nonzero(edges == 1)[0]
                ends = np.nonzero(edges == -1)[0]
                out[i][2] = int(starts.size)
                out[i][3] = burst_gaps
                out[i][4] = int((ends - starts).max())
        return pd.Series(out)

    return kernel


def kleinberg_bursts(
    events: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    s: float = 2.0,
    gamma: float = 1.0,
) -> DataFrame:
    """(host, n_events, n_gaps, n_bursts, burst_gaps, max_run) — the
    pinned 2-state Kleinberg automaton per host; see module docstring."""
    if s <= 1.0:
        raise ValueError(f"s must exceed 1 (burst rate = s·base), got {s}")
    if gamma <= 0:
        raise ValueError(f"gamma must be positive, got {gamma}")
    dt = events.schema[ts_col].dataType
    tcol = F.col(ts_col)
    if isinstance(dt, T.TimestampNTZType):
        # wall-clock epoch-µs WITHOUT a timezone interpretation:
        # NTZ−NTZ is a day-time interval, cast to decimal seconds is
        # exact to the µs (unix_micros refuses NTZ, and a cast through
        # TIMESTAMP would silently bake in the session timezone)
        epoch = F.lit(datetime.datetime(1970, 1, 1)).cast("timestamp_ntz")
        micros = ((tcol - epoch).cast("decimal(38,6)") * F.lit(1000000)).cast(
            "long"
        )
    elif isinstance(dt, T.TimestampType):
        micros = F.unix_micros(tcol)
    else:
        micros = tcol.cast("long")  # already integer epoch-µs
    grouped = events.groupBy(F.col(host_col).alias("host")).agg(
        F.sort_array(F.collect_list(micros)).alias("ts_arr")
    )
    summ = grouped.select(
        "host", _burst_summaries(s, gamma)(F.col("ts_arr")).alias("v")
    )
    return summ.select(
        "host",
        F.col("v")[0].alias("n_events"),
        F.col("v")[1].alias("n_gaps"),
        F.col("v")[2].alias("n_bursts"),
        F.col("v")[3].alias("burst_gaps"),
        F.col("v")[4].alias("max_run"),
    )


def burst_oracle_sql(states_path: str, hosts_path: str) -> str:
    """Gaps-and-islands aggregation (plain SQL) over the materialized
    independent per-gap reference states: n_bursts = #islands of
    state 1, burst_gaps = Σ state, max_run = longest island. Hosts
    with no gaps (or the Σx=0 pin) appear only in ``hosts_path`` and
    emit zeros."""
    return f"""
WITH st AS (
  SELECT host, idx, state FROM read_parquet('{states_path}')
), islands AS (
  SELECT host,
         idx - row_number() OVER (PARTITION BY host ORDER BY idx) AS grp
  FROM st WHERE state = 1
), runs AS (
  SELECT host, count(*) AS run_len FROM islands GROUP BY host, grp
), per_host AS (
  SELECT host, count(*) AS n_bursts, sum(run_len) AS burst_gaps,
         max(run_len) AS max_run
  FROM runs GROUP BY host
)
SELECT h.host, h.n_events, h.n_gaps,
       COALESCE(p.n_bursts, 0)::BIGINT AS n_bursts,
       COALESCE(p.burst_gaps, 0)::BIGINT AS burst_gaps,
       COALESCE(p.max_run, 0)::BIGINT AS max_run
FROM read_parquet('{hosts_path}') h
LEFT JOIN per_host p ON p.host = h.host
"""

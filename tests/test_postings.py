"""operators/postings.py (T92) — gap-code bit accounting: a
first-principles Python twin (actual Elias codeword lengths, not the
closed forms), hand pins, dense-vs-sparse ordering, the NULL hot-term
path, DuckDB twin parity, and the map-only / Python-free plan
contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.postings import (
    RAW_BITS_PER_POSTING,
    postings_compression,
    postings_compression_sql,
)


def _gamma_len(g: int) -> int:
    # actual Elias γ codeword: unary(width) + width-1 binary bits
    w = g.bit_length()
    return (w - 1) + 1 + (w - 1)


def _delta_len(g: int) -> int:
    # actual Elias δ: γ(width) then width-1 binary bits
    w = g.bit_length()
    return _gamma_len(w) + (w - 1)


def _vbyte_len(g: int) -> int:
    w = g.bit_length()
    return 8 * ((w + 6) // 7)


def _py_ref(postings):
    if postings is None:
        return dict.fromkeys(
            ["n_postings", "raw_bits", "gamma_bits", "delta_bits",
             "vbyte_bits", "gamma_ratio"]
        )
    gaps = [
        p - (postings[i - 1] if i else -1) for i, p in enumerate(postings)
    ]
    gamma = sum(_gamma_len(g) for g in gaps)
    raw = len(postings) * RAW_BITS_PER_POSTING
    return {
        "n_postings": len(postings),
        "raw_bits": raw,
        "gamma_bits": gamma,
        "delta_bits": sum(_delta_len(g) for g in gaps),
        "vbyte_bits": sum(_vbyte_len(g) for g in gaps),
        "gamma_ratio": round(gamma / raw, 6) if postings else None,
    }


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "term string, df long, cf long, postings array<bigint>"
    )
    return {
        r["term"]: r.asDict() for r in postings_compression(df).collect()
    }


def test_hand_pinned_single_gap(spark):
    # postings [0] → gap 1 → γ=1 bit, δ=1 bit, vbyte=8 bits
    out = _run(spark, [("t", 1, 1, [0])])["t"]
    assert out["gamma_bits"] == 1
    assert out["delta_bits"] == 1
    assert out["vbyte_bits"] == 8
    assert out["raw_bits"] == RAW_BITS_PER_POSTING
    assert out["gamma_ratio"] == round(1 / 64, 6)


def test_python_reference_twin(spark):
    cases = {
        "dense": list(range(50)),
        "sparse": [0, 1000, 1001, 65535, 10**9],
        "pair": [7, 8],
        "big": [2**40, 2**41],
        "hot": None,
    }
    out = _run(
        spark,
        [(k, len(v or []), len(v or []), v) for k, v in cases.items()],
    )
    for k, v in cases.items():
        ref = _py_ref(v)
        got = out[k]
        for col, want in ref.items():
            assert got[col] == want, (k, col, got[col], want)


def test_dense_list_compresses_best(spark):
    dense = list(range(100))
    sparse = [i * 10**6 for i in range(100)]
    out = _run(
        spark, [("d", 100, 100, dense), ("s", 100, 100, sparse)]
    )
    assert out["d"]["gamma_bits"] == 100  # all gaps 1 → 1 bit each
    assert out["d"]["gamma_bits"] < out["s"]["gamma_bits"]
    assert out["d"]["gamma_ratio"] < out["s"]["gamma_ratio"] < 1.0


def test_null_postings_keep_stats_null_costs(spark):
    out = _run(spark, [("hot", 400, 9000, None)])["hot"]
    assert out["df"] == 400 and out["cf"] == 9000
    for c in ("n_postings", "raw_bits", "gamma_bits", "delta_bits",
              "vbyte_bits", "gamma_ratio"):
        assert out[c] is None, c


def test_duckdb_twin_bit_parity(spark):
    rows = [
        ("a", 3, 5, [0, 4, 1000]),
        ("b", 1, 1, [123456789]),
        ("hot", 99, 500, None),
    ]
    got = _run(spark, rows)

    def lit(v):
        return "NULL" if v is None else f"[{', '.join(map(str, v))}]"

    vals = ", ".join(
        f"('{t}', {df}, {cf}, CAST({lit(p)} AS BIGINT[]))"
        for t, df, cf, p in rows
    )
    cte = (
        f"ix AS (SELECT * FROM (VALUES {vals})"
        " t(term, df, cf, postings))"
    )
    cur = duckdb.connect().execute(postings_compression_sql(cte))
    cols = [d[0] for d in cur.description]
    want = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    for t in got:
        for c in cols:
            assert got[t][c] == want[t][c], (t, c)


def test_plan_map_only_python_free(spark):
    df = spark.createDataFrame(
        [("t", 1, 1, [0])],
        "term string, df long, cf long, postings array<bigint>",
    )
    plan = (
        postings_compression(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan

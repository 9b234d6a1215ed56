"""operators/rproj.py (T98) — sparse random projection: a numpy
reference twin for the projection itself, the JL distance-preservation
envelope on pairwise distances, matrix determinism and sparsity, zero-
vector NULLs, DuckDB twin bit parity, and the map-only/Python-free
plan contract."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from warcsum_spark.operators.rproj import (
    project,
    rp_matrix,
    rp_report,
    rp_report_sql,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_matrix_deterministic_sparse_scaled(spark):
    R1 = rp_matrix(64, 16, seed=42)
    R2 = rp_matrix(64, 16, seed=42)
    assert R1 == R2
    flat = [v for row in R1 for v in row]
    c = math.sqrt(3.0) / math.sqrt(16.0)
    assert set(np.sign(flat)) <= {-1.0, 0.0, 1.0}
    nz = [v for v in flat if v != 0.0]
    assert all(abs(abs(v) - c) < 1e-15 for v in nz)
    # ~1/3 of entries nonzero (p = 1/6 + 1/6); allow wide tolerance
    assert 0.2 < len(nz) / len(flat) < 0.5
    assert rp_matrix(64, 16, seed=7) != R1


def test_projection_matches_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.randn(20, 32).astype(np.float32)
    R = np.array(rp_matrix(32, 8), dtype=np.float64)
    out = {
        r["vec_id"]: r["proj"]
        for r in project(_emb_df(spark, vecs), 32, 8).collect()
    }
    for i, v in enumerate(vecs):
        want = R @ v.astype(np.float64)
        got = np.array(out[i])
        assert np.allclose(got, np.round(want, 6), atol=2e-6), i


def test_jl_distance_preservation_envelope(spark):
    # JL with dim_out=64 over 300 pairs: distances preserved within
    # a generous multiplicative envelope
    rng = np.random.RandomState(1)
    vecs = rng.randn(25, 128).astype(np.float32)
    out = {
        r["vec_id"]: np.array(r["proj"])
        for r in project(_emb_df(spark, vecs), 128, 64).collect()
    }
    ratios = []
    for i in range(25):
        for j in range(i + 1, 25):
            d_in = np.linalg.norm(
                vecs[i].astype(np.float64) - vecs[j].astype(np.float64)
            )
            d_out = np.linalg.norm(out[i] - out[j])
            ratios.append(d_out / d_in)
    assert 0.5 < min(ratios) and max(ratios) < 1.6
    assert abs(float(np.median(ratios)) - 1.0) < 0.15


def test_report_norms_and_zero_vector(spark):
    vecs = [[1.0] + [0.0] * 31, [0.0] * 32]
    rep = {
        r["vec_id"]: r.asDict()
        for r in rp_report(_emb_df(spark, vecs), 32, 8).collect()
    }
    assert rep[0]["norm_in"] == 1.0
    assert rep[0]["distortion"] == rep[0]["norm_out"]
    assert rep[1]["norm_in"] == 0.0
    assert rep[1]["distortion"] is None


def test_duckdb_twin_bit_parity(spark, tmp_path):
    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 24).astype(np.float32)
    df = _emb_df(spark, vecs)
    got = {r["vec_id"]: tuple(r) for r in rp_report(df, 24, 6).collect()}
    pq = str(tmp_path / "e.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    sql = rp_report_sql(
        f"SELECT vec_id, embedding FROM read_parquet('{pq}')",
        dim_in=24,
        dim_out=6,
    )
    want = {r[0]: tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want  # bit parity by sequential-fold construction


def test_plan_map_only_python_free(spark):
    df = _emb_df(spark, [[1.0, 2.0]])
    plan = (
        project(df, 2, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan

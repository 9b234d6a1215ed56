"""operators/pq.py (T106) — product quantization ADC: trainer
determinism, the sequential-fold lut contract, an encode hand pin,
zero reconstruction error on codebook points, ADC-vs-exact top-1
agreement on clustered data, DuckDB twin bit parity, the broadcast
plan shape, and the dim/m guard."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from warcsum_spark.operators.pq import (
    _kmeans_l2,
    ann_pq_sql,
    ann_pq_topk,
    encode_pq,
    pq_lut,
    train_pq_codebooks,
)


def _clustered(n=48, dim=8, n_centers=4, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, dim) * 3.0
    X = centers[np.arange(n) % n_centers] + 0.05 * rng.randn(n, dim)
    return np.round(X, 6)


def _corpus_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )


def test_trainer_deterministic_and_shaped(spark):
    X = _clustered()
    df = _corpus_df(spark, X)
    cb1 = train_pq_codebooks(df, m=2, k=4, train_size=48)
    cb2 = train_pq_codebooks(df, m=2, k=4, train_size=48)
    assert cb1.shape == (2, 4, 4)
    assert np.array_equal(cb1, cb2)


def test_dim_must_divide_by_m(spark):
    df = _corpus_df(spark, _clustered(dim=8))
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(df, m=3, k=2, train_size=48)


def test_lut_matches_bruteforce_entries():
    cb = np.arange(2 * 3 * 2, dtype=np.float64).reshape(2, 3, 2) / 7.0
    q = np.array([0.3, -1.2, 2.5, 0.0])
    lut = pq_lut(q, cb)
    assert len(lut) == 6
    for j in range(2):
        for c in range(3):
            want = float(((q[j * 2 : (j + 1) * 2] - cb[j][c]) ** 2).sum())
            assert lut[j * 3 + c] == pytest.approx(want, abs=1e-12)


def test_encode_hand_pin(spark):
    # m=2, k=2: subspace 0 centroids at 0 and 10; subspace 1 at 0 and -10
    cb = np.array([[[0.0, 0.0], [10.0, 10.0]], [[0.0, 0.0], [-10.0, -10.0]]])
    df = _corpus_df(
        spark, np.array([[9.0, 9.0, 0.1, 0.1], [0.2, 0.1, -9.0, -9.5]])
    )
    got = {r["vec_id"]: list(r["codes"]) for r in encode_pq(df, cb).collect()}
    assert got == {0: [1, 0], 1: [0, 1]}


def test_zero_reconstruction_on_codebook_points(spark):
    X = _clustered()
    df = _corpus_df(spark, X)
    cb = train_pq_codebooks(df, m=2, k=4, train_size=48)
    # corpus rows that ARE codebook concatenations -> ADC == exact L2
    recon = np.concatenate([cb[0][[0, 1]], cb[1][[2, 3]]], axis=1)
    corpus = _corpus_df(spark, recon)
    queries = spark.createDataFrame(
        [(0, [float(x) for x in recon[1]])],
        "query_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in ann_pq_topk(corpus, queries, cb, k_top=2).collect()
    }
    assert got[1] == 0.0
    exact = float(((recon[0] - recon[1]) ** 2).sum())
    assert got[0] == pytest.approx(exact, abs=1e-5)


def test_adc_top1_matches_exact_on_clustered_data(spark):
    X = _clustered()
    df = _corpus_df(spark, X)
    cb = train_pq_codebooks(df, m=2, k=4, train_size=48)
    qvecs = _clustered(n=6, seed=11)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qvecs[i]]) for i in range(6)],
        "query_id long, embedding array<double>",
    )
    got = {
        r["query_id"]: r["vec_id"]
        for r in ann_pq_topk(df, queries, cb, k_top=1).collect()
    }
    for qid in range(6):
        exact = ((X - qvecs[qid]) ** 2).sum(axis=1)
        # cluster identity must agree even where the exact id is quantized away
        assert got[qid] % 4 == int(exact.argmin()) % 4, qid


def test_duckdb_twin_bit_parity(spark):
    X = _clustered(n=20)
    df = _corpus_df(spark, X)
    cb = train_pq_codebooks(df, m=2, k=4, train_size=20)
    qvecs = _clustered(n=3, seed=13)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qvecs[i]]) for i in range(3)],
        "query_id long, embedding array<double>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"])
        for r in ann_pq_topk(df, queries, cb, k_top=5).collect()
    }
    vals = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(float(x)) for x in X[i]) + "])"
        for i in range(len(X))
    )
    luts = {i: pq_lut(qvecs[i], cb) for i in range(3)}
    sql = ann_pq_sql(
        f"SELECT * FROM (VALUES {vals}) t(vec_id, e)", cb, luts, k_top=5
    )
    cur = duckdb.connect().execute(sql)
    want = {(r[0], r[3]): (r[1], r[2]) for r in cur.fetchall()}
    assert got == want


def test_plan_broadcasts_queries(spark):
    X = _clustered(n=12)
    df = _corpus_df(spark, X)
    cb = train_pq_codebooks(df, m=2, k=4, train_size=12)
    queries = spark.createDataFrame(
        [(0, [float(x) for x in X[0]])],
        "query_id long, embedding array<double>",
    )
    plan = (
        ann_pq_topk(df, queries, cb, k_top=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_needs_enough_rows():
    with pytest.raises(ValueError, match="training rows"):
        _kmeans_l2(np.zeros((3, 2)), k=8)

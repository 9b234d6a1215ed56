"""T54 SemDedup: k-means-clustered embedding dedup (operators/semdedup.py).

Pins the blocked Arrow/pandas kernels against an independent pure-numpy
reference that replays the paper semantics naively (full pairwise per
cluster, no blocking), plus hand-built cases for the keep rule.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.semdedup import _round6, semdedup
from warcsum_spark.operators.similarity import _kmeans_spherical


def _ref_semdedup(ids, X, C, threshold):
    """Independent reference: assign → rank → full pairwise prefix scan.
    Returns {vec_id: (centroid_id, centroid_sim, is_dup)}."""
    X = np.asarray(X, dtype=np.float64)
    V = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sims = V @ C.T
    out = {}
    for cid in range(len(C)):
        members = [
            (round6_scalar(sims[i, cid]), ids[i], i)
            for i in range(len(ids))
            if best_centroid(sims[i]) == cid
        ]
        members.sort()
        kept = []
        for csim, vid, i in members:
            dup = any(
                round6_scalar(float(V[i] @ V[j])) >= threshold for j in kept
            )
            # "exists earlier neighbor" semantics: EVERY higher-priority
            # row is a comparison target, duplicate or not
            kept.append(i)
            out[vid] = (cid, csim, dup)
    return out


def best_centroid(row):
    # stable argmax desc → lowest centroid id on ties
    return int(np.argsort(-row, kind="stable")[0])


def round6_scalar(x):
    return float(_round6(np.array([x]))[0])


def _df(spark, ids, X):
    return spark.createDataFrame(
        [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )


def test_exact_duplicates_pruned_keep_least_prototypical(spark):
    # centroid at e0; a=exactly e0 (most prototypical), b=slightly off
    # (lower centroid_sim). a and b are near-identical → one is dropped,
    # and the keep rule keeps the LOWER-centroid-sim row (b).
    C = np.eye(2, 4)  # two unit centroids: e0, e1
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.999, 0.04, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]  # other cluster
    out = semdedup(
        _df(spark, [1, 2, 3], [a, b, far]), C, threshold=0.95
    ).collect()
    rows = {r.vec_id: r for r in out}
    assert rows[3].centroid_id == 1 and not rows[3].is_dup
    assert rows[1].centroid_id == 0 and rows[2].centroid_id == 0
    # b (id 2) has lower centroid_sim → higher priority → kept
    assert not rows[2].is_dup
    assert rows[1].is_dup


def test_below_threshold_all_kept(spark):
    C = np.eye(1, 3)
    X = [[1.0, 0.0, 0.0], [0.7, 0.7, 0.0], [0.7, -0.7, 0.0]]
    out = semdedup(_df(spark, [1, 2, 3], X), C, threshold=0.99).collect()
    assert all(not r.is_dup for r in out)


def test_id_tiebreak_on_equal_centroid_sim(spark):
    # identical vectors: equal centroid_sim → lowest id wins (kept)
    C = np.eye(1, 3)
    v = [0.8, 0.6, 0.0]
    out = semdedup(_df(spark, [7, 3, 9], [v, v, v]), C, threshold=0.95).collect()
    rows = {r.vec_id: r.is_dup for r in out}
    assert rows == {3: False, 7: True, 9: True}


@pytest.mark.parametrize("block", [2, 1024])
def test_matches_reference_random_corpus(spark, block):
    rng = np.random.RandomState(7)
    base = rng.randn(40, 8)
    # inject near-dups: copies of the first 10 rows with small noise
    X = np.vstack([base, base[:10] + rng.randn(10, 8) * 0.01])
    ids = list(range(len(X)))
    C = _kmeans_spherical(np.asarray(X, dtype=np.float64), 4, seed=3)
    got = {
        r.vec_id: (r.centroid_id, r.centroid_sim, r.is_dup)
        for r in semdedup(_df(spark, ids, X), C, threshold=0.9, block=block).collect()
    }
    want = _ref_semdedup(ids, X, C, threshold=0.9)
    assert set(got) == set(want)
    for vid in want:
        assert got[vid][0] == want[vid][0], vid
        assert got[vid][1] == pytest.approx(want[vid][1], abs=1e-9)
        assert got[vid][2] == want[vid][2], vid
    assert any(v[2] for v in want.values())  # the injected dups actually bite


def test_survivor_filter_and_single_exchange_plan(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(30, 6)
    C = _kmeans_spherical(np.asarray(X, dtype=np.float64), 3, seed=5)
    df = semdedup(_df(spark, range(30), X), C, threshold=0.95)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE exchange: the centroid_id hash partition feeding applyInPandas
    assert plan.count("Exchange") == 1, plan
    survivors = df.filter(~F.col("is_dup"))
    assert survivors.count() == df.count() - df.filter("is_dup").count()

"""T68 — centroid drift: vs a numpy reference, identity/orthogonal
pins, single-batch-key dropout, and shuffle slimness (centroid
exchange carries dimension-sized groups)."""

from __future__ import annotations

import numpy as np
import pytest

from warcsum_spark.operators.drift import centroid_drift


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "label int, embedding array<float>"
    )


def _ref_cosine(va: list[list[float]], vb: list[list[float]]) -> float:
    a = np.asarray(va, dtype=np.float64).mean(axis=0)
    b = np.asarray(vb, dtype=np.float64).mean(axis=0)
    return round(
        float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
    )


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(5)
    va = rng.normal(size=(20, 8)).astype(np.float32)
    vb = (rng.normal(size=(15, 8)) + 0.5).astype(np.float32)
    a = _mk(spark, [(1, v.tolist()) for v in va])
    b = _mk(spark, [(1, v.tolist()) for v in vb])
    out = centroid_drift(a, b, ["label"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (20, 15)
    assert r.cosine == pytest.approx(
        _ref_cosine(va.tolist(), vb.tolist()), abs=2e-6
    )


def test_identical_batches_no_drift(spark):
    rows = [(1, [1.0, 2.0, 3.0]), (1, [3.0, 2.0, 1.0]), (2, [1.0, 0.0, 0.0])]
    a = _mk(spark, rows)
    out = {r.label: r.cosine for r in centroid_drift(a, a, ["label"]).collect()}
    assert out == {1: 1.0, 2: 1.0}


def test_orthogonal_centroids(spark):
    a = _mk(spark, [(1, [1.0, 0.0])])
    b = _mk(spark, [(1, [0.0, 1.0])])
    assert centroid_drift(a, b, ["label"]).collect()[0].cosine == 0.0


def test_one_sided_keys_drop(spark):
    a = _mk(spark, [(1, [1.0, 0.0]), (2, [1.0, 1.0])])
    b = _mk(spark, [(1, [1.0, 0.0])])
    labels = {r.label for r in centroid_drift(a, b, ["label"]).collect()}
    assert labels == {1}

"""operators/classify.py — hashed linear scorer vs a pure-Python twin,
threshold behavior, weight injection, and the zero-shuffle/zero-Python
plan property."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from warcsum_spark.operators.classify import (
    classify_quality,
    stub_weights,
)


def _ref_score(text, weights, seed=7, intercept=0.0):
    norm = re.sub("^ | $", "", re.sub("[ \t\n\x0b\f\r]+", " ", text.lower()))
    words = norm.split(" ") if norm else []
    dim = len(weights)
    s = 0.0
    for t in words:
        b = int(hashlib.md5(f"{seed}:{t}".encode()).hexdigest()[:4], 16)
        s += weights[b % dim]
    raw = intercept + s / max(len(words), 1)
    return round(1.0 / (1.0 + math.exp(-raw)), 6)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "Buy NOW!!! cheap pills CHEAP pills buy now",
    "",
    "   \n\t ",
    "word",
    "Mixed CASE Tokens with  double  spaces and\nnewlines",
]


def test_matches_python_reference(spark):
    w = stub_weights()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["model_score"] for r in classify_quality(df).collect()}
    for i, t in enumerate(TEXTS):
        assert abs(got[i] - _ref_score(t, w)) < 2e-6, (i, got[i], _ref_score(t, w))


def test_empty_doc_scores_sigmoid_of_intercept(spark):
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = classify_quality(df, intercept=2.0).collect()[0]
    assert abs(row["model_score"] - round(1 / (1 + math.exp(-2.0)), 6)) < 1e-9


def test_injected_weights_and_threshold(spark):
    # all-positive weights → every non-empty doc keeps; raise threshold → drops
    w = [0.9] * 64
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    keep = classify_quality(df, weights=w).collect()[0]
    assert keep["model_keep"] is True
    drop = classify_quality(df, weights=w, threshold=0.99).collect()[0]
    assert drop["model_keep"] is False


def test_plan_is_map_only_jvm(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (
        classify_quality(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "Arrow" not in plan, plan


def test_null_text_scores_like_empty(spark):
    import math

    df = spark.createDataFrame([(0, None), (1, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in classify_quality(df).collect()}
    want = round(1 / (1 + math.exp(0.0)), 6)  # sigmoid(0) = 0.5
    assert rows[0]["model_score"] == rows[1]["model_score"] == want
    assert rows[0]["model_keep"] is True

"""Model-based quality scoring — the hashed linear text classifier
(fastText-style bag-of-hashed-words) that production pipelines run after
the rule batteries: score = sigmoid(b + mean of per-token weights),
token → weight bucket via the hashing trick.

What is real here and what is stubbed, per the build brief's multimodal
convention: the PLUMBING is real — hashing-trick bucketing, broadcast
weight vector, mean-pool, sigmoid, threshold filter, all as JVM
expressions that fuse into the scan — while the WEIGHTS are a
deterministic stub (``stub_weights``: md5-derived values in [-1, 1]).
Swapping in trained fastText/CCNet weights is a parameter change, not a
code change.

Scale shape: the model rides as an array LITERAL in the plan (a 2^8-
dimension stub here; a real 2^21-dim model would be a broadcast variable
feeding the same ``element_at`` lookup). Zero joins, zero shuffles, zero
Python — the score is a map-side column like any other quality measure.

Token bucketing reuses the md5 16-bit bucket from operators/mixing.py
(engine-portable: the DuckDB oracle recomputes identical buckets), taken
mod the weight dimension.

The words column is STAGED before the lambda uses it — see
functions/repetition.py::stage_repetition_units for why inline word
arrays inside higher-order functions re-evaluate per element.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.mixing import fine_bucket


def stub_weights(dim: int = 256, seed: int = 7) -> list[float]:
    """Deterministic pseudo-weights in [-1, 1): the i-th weight derives
    from md5(f"{seed}:w:{i}") — reproducible anywhere, including inside
    the DuckDB oracle's SQL literal."""
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{seed}:w:{i}".encode()).hexdigest()[:8], 16)
        out.append(h / 2**31 - 1.0)
    return out


def hashed_linear_score(
    words_col: Column,
    weights: list[float],
    intercept: float = 0.0,
    seed: int = 7,
) -> Column:
    """sigmoid(intercept + mean over tokens of weights[bucket(token)]).
    Empty documents score sigmoid(intercept). ``words_col`` must be a
    staged column reference (not an inline split expression)."""
    dim = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    token_w = F.transform(
        words_col,
        lambda t: F.element_at(warr, (fine_bucket(t, seed) % dim) + 1),
    )
    mean_w = F.aggregate(
        token_w, F.lit(0.0), lambda a, x: a + x
    ) / F.greatest(F.size(words_col), F.lit(1)).cast("double")
    raw = F.lit(float(intercept)) + mean_w
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))


def classify_quality(
    df: DataFrame,
    text_col: str = "text",
    weights: list[float] | None = None,
    threshold: float = 0.5,
    intercept: float = 0.0,
    seed: int = 7,
    score_col: str = "model_score",
    keep_col: str = "model_keep",
) -> DataFrame:
    """+ ``model_score`` (rounded to 6) and ``model_keep`` columns."""
    from warcsum_spark.functions.repetition import _norm_words

    weights = weights if weights is not None else stub_weights(seed=seed)
    # null text scores like empty text (sigmoid(intercept)) — matching
    # the SQL oracle's coalesce(list_sum(NULL), 0) — rather than
    # propagating null through score and keep
    staged = df.withColumn(
        "_cls_words",
        _norm_words(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
    )
    score = F.round(
        hashed_linear_score(F.col("_cls_words"), weights, intercept, seed), 6
    )
    return (
        staged.withColumn(score_col, score)
        .withColumn(keep_col, F.col(score_col) >= threshold)
        .drop("_cls_words")
    )

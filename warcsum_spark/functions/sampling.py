"""Deterministic corpus sampling/splitting.

``hash_split`` is the reproducible-split idiom for training data at
100 TB: the split of a document is a pure function of (seed, id) — no
RNG state, no ordering dependence, stable across engines, re-runs, and
cluster sizes, and any engine that has md5 can recompute membership
(the driver's DuckDB oracle does). Buckets are the first byte of
``md5(seed ':' id)`` (256 of them); weights map to contiguous bucket
ranges by cumulative share, floor-rounded, with the last split taking
the remainder — so weights (0.8, 0.1, 0.1) give buckets [0,204),
[204,230), [230,256).

``sample_fraction`` is the same trick as a filter: keep iff
bucket/256 < fraction. Use it for bounded deterministic subsets
(debug corpora, eval slices) instead of ``df.sample`` whose output
depends on partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_N_BUCKETS = 256


def _bucket(id_col: Column, seed: int) -> Column:
    key = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return F.conv(F.substring(key, 1, 2), 16, 10).cast("int")


def split_bounds(weights: dict[str, float]) -> list[tuple[str, int, int]]:
    """(name, lo, hi) bucket ranges — floor-rounded cumulative shares,
    last split absorbs the remainder. Shared by engine and oracle.

    Shares are quantized to 1/256: a weight whose floor-rounded share
    collapses to zero buckets (below ~1/256, or unlucky rounding) would
    silently receive zero rows, so empty ranges raise instead."""
    total = sum(weights.values())
    names = list(weights)
    bounds = []
    cum = 0.0
    lo = 0
    for i, name in enumerate(names):
        cum += weights[name] / total
        hi = _N_BUCKETS if i == len(names) - 1 else int(cum * _N_BUCKETS)
        if hi <= lo:
            raise ValueError(
                f"split {name!r} maps to an empty bucket range [{lo},{hi}): "
                f"weights are quantized to 1/{_N_BUCKETS} shares — raise its "
                f"weight or merge it into a neighbor"
            )
        bounds.append((name, lo, hi))
        lo = hi
    return bounds


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """+ ``split`` column: deterministic md5-bucket assignment (module
    docstring). Pure JVM expressions — md5 + hex→int conv + CASE.
    Weights are quantized to 1/256 shares; a weight too small for one
    bucket raises in ``split_bounds`` rather than yielding zero rows."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = _bucket(F.col(id_col), seed)
    expr = None
    for name, _lo, hi in split_bounds(weights)[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = split_bounds(weights)[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic ``fraction``-subset: keep iff bucket < frac·256
    (granularity 1/256 — document the quantization, don't hide it)."""
    return df.filter(_bucket(F.col(id_col), seed) < int(fraction * _N_BUCKETS))


def bucket_sql(id_expr: str, seed: int = 42) -> str:
    """DuckDB expression for the same bucket (md5 hex pair → int via
    strpos arithmetic — DuckDB has no hex→int conv)."""
    h = f"md5('{seed}:' || CAST({id_expr} AS VARCHAR))"
    return (
        f"((strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-rebalancing idiom
    (downsample dominant languages/domains, keep the tail whole): keep a
    row iff ``bucket(seed, id) < rates[group]·256``. Same purity
    guarantees as ``hash_split``: membership is a function of
    (seed, id, group rate) only — reproducible across engines, re-runs,
    partitionings, and cluster sizes, and the SAME ids survive whenever
    two runs share a rate (lowering a rate yields a subset of the
    previous sample, so corpus versions nest).

    ``rates`` is a small driver-side dict → an inline CASE over the
    group column; groups not listed keep ``default_rate`` (0.0 = drop —
    explicit rates only — pass 1.0 to keep unlisted strata whole).
    Map-only JVM expressions; rates quantized to 1/256 like everything
    in this module."""
    b = _bucket(F.col(id_col), seed)
    thr = None
    for name, rate in rates.items():
        t = F.lit(int(rate * _N_BUCKETS))
        cond = F.col(group_col) == name
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(int(default_rate * _N_BUCKETS))
        if thr is None
        else thr.otherwise(F.lit(int(default_rate * _N_BUCKETS)))
    )
    return df.filter(b < thr)

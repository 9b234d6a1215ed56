"""Corpus mixing / domain reweighting — downsample groups (language,
domain, source) so the surviving corpus matches TARGET proportions,
deterministically. The pretraining-mix step: "40% en, 20% de, …"
applied to a crawl whose natural mix is whatever the crawl found.

Semantics (no upsampling): the largest corpus size N consistent with
the targets is ``N = min_g(count_g / share_g)`` — the binding group
keeps everything, every other group keeps ``share_g · N / count_g`` of
its rows. Membership is the hash-bucket trick from
functions/sampling.py at 1/65536 granularity (16 bits of the row's
md5): a pure function of ``(seed, id)``, so the sample is stable across
re-runs, partitionings, engines, and cluster sizes, and any engine with
md5 can recompute it (the DuckDB oracle does).

Plan shape — fully distributed, no driver action:

1. ``groupBy(group).count()`` — one dimension-sized aggregate;
2. ``min(count / share) over ()`` — a window over that dimension table
   (tens-to-thousands of rows; the unpartitioned window is a non-cost);
3. broadcast-join the per-group fraction back, filter
   ``bucket/65536 < frac`` — map-side on the full corpus.

The corpus is scanned once for counts and once for the filter; at
100 TB both passes are map-only against the scan plus one
dimension-size shuffle. Achieved proportions are exact up to hash-
bucket quantization (±count_g/65536 rows per group).

Groups absent from ``target_weights`` are dropped (weight 0); weights
are normalized, so {"en": 4, "de": 1} means 80/20.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FINE_BUCKETS = 65536


def fine_bucket(id_col: Column, seed: int) -> Column:
    """16-bit md5 bucket of (seed, id) — the 1/65536-granularity sibling
    of functions/sampling.py::_bucket."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return F.conv(F.substring(key, 1, 4), 16, 10).cast("int")


def fine_bucket_sql(id_expr: str, seed: int = 42) -> str:
    """DuckDB expression for the same 16-bit bucket (strpos arithmetic —
    DuckDB has no hex→int conv)."""
    h = f"md5('{seed}:' || CAST({id_expr} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"({digits})"


def group_fractions(
    df: DataFrame, group_col: str, target_weights: dict[str, float]
) -> DataFrame:
    """(group_col, n_group, mix_frac): the per-group keep fraction that
    realizes the target mix at the maximum no-upsampling corpus size."""
    total_w = sum(target_weights.values())
    if total_w <= 0:
        raise ValueError("target_weights must have positive total")
    share = F.create_map(
        *chain.from_iterable(
            (F.lit(g), F.lit(w / total_w)) for g, w in target_weights.items()
        )
    )[F.col(group_col)]
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("n_group"))
        .withColumn("_share", share)
        .filter(F.col("_share").isNotNull() & (F.col("_share") > 0))
    )
    from pyspark.sql import Window

    n_max = F.min(F.col("n_group") / F.col("_share")).over(
        Window.partitionBy()
    )
    return counts.select(
        group_col,
        "n_group",
        F.least(F.col("_share") * n_max / F.col("n_group"), F.lit(1.0)).alias(
            "mix_frac"
        ),
    )


def mix_corpus(
    df: DataFrame,
    group_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Survivor rows of the reweighted corpus (original columns).
    Groups not in ``target_weights`` are dropped entirely."""
    fracs = group_fractions(df, group_col, target_weights)
    keep = (
        fine_bucket(F.col(id_col), seed) / F.lit(float(_FINE_BUCKETS))
    ) < F.col("mix_frac")
    return (
        df.join(F.broadcast(fracs), group_col)
        .filter(keep)
        .select(*df.columns)
    )


def temperature_fractions(
    df: DataFrame, group_col: str, alpha: float
) -> DataFrame:
    """(group_col, n_group, mix_frac) for TEMPERATURE sampling — the
    multilingual-pretraining mix (mBERT/XLM-R style): target shares are
    computed FROM the natural distribution, ``p_g ∝ n_g^alpha``, instead
    of handed in. Under the no-upsampling rule the per-group keep
    fraction collapses to the closed form ``(n_min / n_g)^(1 - alpha)``
    — the rarest group keeps everything, dominant groups flatten toward
    it as alpha → 0; alpha = 1 is the natural mix (keep all).

    Same plan shape as ``group_fractions``: one dimension-sized
    aggregate plus a window over the group table. The fraction is
    rounded to 6 dp BEFORE the membership threshold (the semdedup
    discipline) so libm-pow ulp noise cannot flip a row's membership
    between engines."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1] (no upsampling)")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("n_group"))
    n_min = F.min("n_group").over(Window.partitionBy())
    frac = F.round(
        F.pow(n_min.cast("double") / F.col("n_group").cast("double"),
              F.lit(1.0 - alpha)),
        6,
    )
    return counts.select(
        group_col,
        "n_group",
        F.least(frac, F.lit(1.0)).alias("mix_frac"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Survivor rows of the temperature-rebalanced corpus (original
    columns) — ``mix_corpus`` with the alpha-derived fractions; the
    same stable md5 fine-bucket membership, so the sample is a pure
    function of (seed, id) at any partitioning or cluster size."""
    fracs = temperature_fractions(df, group_col, alpha)
    keep = (
        fine_bucket(F.col(id_col), seed) / F.lit(float(_FINE_BUCKETS))
    ) < F.col("mix_frac")
    return (
        df.join(F.broadcast(fracs), group_col)
        .filter(keep)
        .select(*df.columns)
    )

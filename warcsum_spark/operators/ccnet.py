"""T78 — CCNet-style per-language quality bucketing (head/middle/tail).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") partitions each language's documents
into perplexity terciles — *head* (lowest perplexity under a clean-data
LM ≈ highest quality), *middle*, *tail* — and downstream recipes mix or
drop buckets per language. The bucket boundary is a per-language
quantile of the score distribution, which makes this a different
operator from the fixed-threshold gates (T13/T24/T73): the cut adapts
to each language's own distribution.

Two tiers, same contract (+ ``bucket`` label column):

* ``rank_buckets`` — exact: bucket from the document's rank within its
  group (``floor(n_buckets·(rank−1)/n)``). One hash exchange on the
  group key plus a per-group sort (the window). This is the
  ground-truth/oracle tier: at 10^10 docs a per-language sort is real
  work and the group key is maximally skewed (English is ~half the
  web), so it is NOT the production path.
* ``threshold_buckets`` — scale: assign by comparing the score against
  precomputed per-group cut points (any (group, q, value) table — the
  T64 HDR sketch's ``hdr_quantiles`` output, or cuts from a sample,
  which is what CCNet itself does). The cut table is
  dimension-sized → broadcast; assignment is map-only JVM codegen;
  zero corpus exchanges, composes with the streaming gates.

pytest pins the tiers against each other (threshold cuts from the
exact ranks reproduce the exact buckets up to boundary ties) and
composes the real T39 ``lm_perplexity`` scores through both.

Reference tie-in: warcsum has no quality notion — this extends the
§2.12 training-data frontier; the per-group-quantile idiom is the
same nearest-rank discipline as operators/quantiles.py (T64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_LABELS = ("head", "middle", "tail")


def _labels_array(n_buckets: int, labels: tuple[str, ...] | None):
    labels = tuple(labels) if labels else (
        DEFAULT_LABELS if n_buckets == 3
        else tuple(f"b{i}" for i in range(n_buckets))
    )
    if len(labels) != n_buckets:
        raise ValueError(
            f"{n_buckets} buckets need {n_buckets} labels, got {labels!r}"
        )
    return F.array(*[F.lit(x) for x in labels])


def rank_buckets(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = ("lang",),
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
    id_col: str = "doc_id",
    out_col: str = "bucket",
) -> DataFrame:
    """Exact tier: bucket i ⇔ floor(n_buckets·(rank−1)/n) == i, rank by
    (value, id) within the group — deterministic under ties, buckets
    balanced to within one document per group."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2: {n_buckets}")
    arr = _labels_array(n_buckets, labels)
    wg = Window.partitionBy(*group_cols)
    w = wg.orderBy(F.col(value_col), F.col(id_col))
    r = F.row_number().over(w)
    n = F.count("*").over(wg)
    idx = F.floor(
        (F.lit(n_buckets) * (r - 1).cast("double")) / n.cast("double")
    ).cast("int")
    return df.withColumn(out_col, F.element_at(arr, idx + 1))


def threshold_buckets(
    df: DataFrame,
    cuts: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = ("lang",),
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Scale tier: ``cuts`` is (group..., q, value) — n_buckets−1 upper
    cut points per group (e.g. ``hdr_quantiles(sketch, keys,
    [1/3, 2/3])``). bucket = number of cuts the score EXCEEDS, so a
    value equal to a cut stays in the lower bucket (nearest-rank
    convention). Groups absent from ``cuts`` raise at assignment time
    via a null bucket only if allow_missing is ever added — today they
    surface as nulls the caller must treat as unscored."""
    arr = _labels_array(n_buckets, labels)
    gcols = list(group_cols)
    per_group = cuts.groupBy(*gcols).agg(
        F.sort_array(F.collect_list("value")).alias("_cuts")
    )
    joined = df.join(F.broadcast(per_group), on=gcols, how="left")
    v = F.col(value_col).cast("double")
    idx = F.when(
        F.col("_cuts").isNotNull(),
        F.size(F.filter("_cuts", lambda c: v > c.cast("double"))),
    )
    return joined.withColumn(
        out_col, F.element_at(arr, F.least(idx, F.lit(n_buckets - 1)) + 1)
    ).drop("_cuts")


def rank_cuts(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = ("lang",),
    n_buckets: int = 3,
) -> DataFrame:
    """Exact per-group cut points for ``threshold_buckets``: the
    nearest-rank q-quantiles at q = i/n_buckets — the largest value of
    bucket i−1, so "> cut" reproduces ``rank_buckets`` exactly except
    where duplicate values straddle the boundary (ties are the
    documented divergence between rank and threshold assignment)."""
    base = df.select(*group_cols, F.col(value_col).alias("_v"))
    wg = Window.partitionBy(*group_cols)
    w = wg.orderBy(F.col("_v"))
    pr = F.row_number().over(w)
    n = F.count("*").over(wg)
    i_arr = F.array(*[F.lit(i) for i in range(1, n_buckets)])
    # target rank ceil(i·n/nb) from INTEGER products — i·n is exact in
    # long, and the double division only needs to not cross an integer,
    # which a remainder ≥ 1/nb guarantees (unlike ceil(q·n) where the
    # rounding of q itself can overshoot, e.g. q=0.2, n=5)
    tgt = F.ceil(
        (F.col("i") * F.col("_n")).cast("double") / F.lit(n_buckets)
    )
    return (
        base.withColumn("_r", pr)
        .withColumn("_n", n)
        .select(*group_cols, "_v", "_r", "_n", F.explode(i_arr).alias("i"))
        .where(F.col("_r") == tgt)
        .groupBy(*group_cols, "i")
        .agg(F.max("_v").alias("value"))
        .select(
            *group_cols,
            (F.col("i").cast("double") / n_buckets).alias("q"),
            "value",
        )
    )

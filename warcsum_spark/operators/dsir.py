"""T40 — DSIR: data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023). Score every raw document by how much more likely its
hashed n-gram features are under a small TARGET corpus (the
distribution you want — e.g. curated encyclopedic text) than under the
RAW corpus, then keep the top slice / resample by the weight. The
standard scalable alternative to training a classifier per domain.

Features and estimator (pinned, engine-portable):

* features: word bigrams hashed into ``n_buckets`` via the md5-bucket
  idiom every sampling operator here shares (first 8 hex chars of
  ``md5(v || ' ' || w)`` as an integer, mod B) — both engines
  recompute membership exactly, no murmur/xxhash divergence;
* bucket distributions with add-alpha smoothing:
  ``p_t[b] = (C_t[b] + alpha) / (N_t + alpha*B)`` and likewise
  ``p_r[b]`` from the raw corpus;
* per-feature log importance weight ``lw[b] = ln(p_t[b]/p_r[b])``,
  kept RAW — only the per-doc aggregates round (6 dp). Rounding lw
  per-bucket would make each doc's sum an exact decimal and park
  ``sum/n`` exactly on round-half boundaries, where engines diverge
  (see operators/lm_score.py for the full argument);
* per-doc ``log_weight`` = SUM of its features' ``lw`` (the paper's
  product-of-probabilities importance weight, in log space) and
  ``avg_log_weight`` = the length-normalized mean — docs with no
  bigram features score NULL.

Plan shape at 100 TB:

1. bigram extraction map-only (operators/lm_score.py stream);
2. hashing map-only (md5 → int — pure JVM);
3. each corpus' bucket histogram: ONE agg keyed on bucket
   (map-side combine collapses the token grain early);
4. the weight table has exactly ``n_buckets`` rows — BROADCAST,
   whatever the corpus size; scoring is a map-side join + one
   doc-keyed agg. Contrast with the LM scorer, whose (v, w) model
   must shuffle: hashing is what buys the broadcast.

The raw corpus is extracted/hashed ONCE even though both the histogram
and the scoring need it: ``dsir_scores`` aggregates to per-(doc,
bucket) counts first and derives the raw histogram from that same
aggregate, so the two consumers share one identical Exchange subtree
and Spark's exchange reuse (ReusedExchange, on by default) computes the
expensive bigram+md5 stream a single time. The naive shape — histogram
from its own id-less stream — re-runs the full extraction per consumer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.lm_score import _bigram_stream


def _feature_bucket(
    v: Column, w: Column, n_buckets: int, hash_fn: str = "md5"
) -> Column:
    """Bucket of one bigram feature. ``md5`` is the ORACLE tier (DuckDB
    recomputes membership exactly — the gate default); ``xxhash64`` is
    the SCALE tier: the same JVM codegen'd hash the engine's shuffles
    use, measured ~2.3× cheaper than md5+conv on the bigram stream
    (1.19 s → 0.81 s incl. the agg at sf0.1 — the hash is ~half the
    extraction cost at any corpus size, so at 10^13 bigrams this is the
    difference that matters). Bucket membership differs between tiers
    (different hash), estimator semantics are identical; the xxhash
    tier is pinned against a pure-Python XXH64 reference in pytest
    (oracle_refs.py's from-scratch implementation, seed-chained exactly
    like F.xxhash64)."""
    if hash_fn == "md5":
        key = F.md5(F.concat(v, F.lit(" "), w))
        return (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_buckets
        ).alias("bucket")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(v, w), F.lit(n_buckets)).alias("bucket")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _bucket_stream(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    n_buckets: int,
    hash_fn: str = "md5",
) -> DataFrame:
    bg = _bigram_stream(df, id_cols, text_col)
    return bg.select(
        *id_cols,
        _feature_bucket(F.col("v"), F.col("w"), n_buckets, hash_fn),
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.1,
    hash_fn: str = "md5",
    _raw_hist: DataFrame | None = None,
) -> DataFrame:
    """(bucket, lw) — per-bucket log importance weight, ≤ ``n_buckets``
    rows (broadcast-sized by construction): the full outer join covers
    every bucket observed in EITHER corpus, which is every bucket
    ``dsir_scores`` can look up as long as it scores the same ``raw``
    frame the histogram was built from (its invariant).

    ``_raw_hist`` (internal): a precomputed ``(bucket, c_r)`` histogram
    of ``raw`` — ``dsir_scores`` passes the one derived from its own
    per-doc aggregate so the raw extraction pass is shared (see module
    docstring); standalone callers leave it None."""
    t = (
        _bucket_stream(target, [], text_col, n_buckets, hash_fn)
        .groupBy("bucket")
        .agg(F.count("*").alias("c_t"))
    )
    r = (
        _raw_hist
        if _raw_hist is not None
        else _bucket_stream(raw, [], text_col, n_buckets, hash_fn)
        .groupBy("bucket")
        .agg(F.count("*").alias("c_r"))
    )
    # cached: the totals aggregate and the weight projection both consume
    # this frame — uncached, each re-runs BOTH corpus bigram extractions.
    # ≤ n_buckets rows by construction, so the cache is dimension-sized.
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
        F.coalesce("c_r", F.lit(0)).alias("c_r"),
    ).cache()
    # totals as 1-row broadcast cross joins: one lazy plan, no collect
    totals = joined.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    ab = F.lit(alpha * n_buckets)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.log(
            ((F.col("c_t") + F.lit(alpha)) / (F.col("n_t") + ab))
            / ((F.col("c_r") + F.lit(alpha)) / (F.col("n_r") + ab))
        ).alias("lw"),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.1,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_col, n_features, log_weight, avg_log_weight) for every raw
    doc. Select by ``log_weight`` rank (top slice) or resample by it."""
    # Null-id docs can never be scored (the spine left join can't match
    # them), so drop them from the feature stream up front. This also
    # makes the two consumers of ``g`` canonically IDENTICAL: the spine
    # join pushes an isnotnull(doc_col) filter into the scoring branch,
    # and without the explicit filter here the raw-histogram branch
    # lacks it, which defeats ReuseExchange and re-runs the extraction.
    keyed = raw.filter(F.col(doc_col).isNotNull())
    feats = _bucket_stream(keyed, [doc_col], text_col, n_buckets, hash_fn)
    # per-(doc, bucket) counts: the ONE exchange over the raw stream.
    # Both the raw histogram and the scoring join hang off this same
    # subtree, so ReusedExchange runs the bigram+md5 extraction once.
    g = feats.groupBy(doc_col, "bucket").agg(F.count("*").alias("_n"))
    raw_hist = g.groupBy("bucket").agg(F.sum("_n").alias("c_r"))
    weights = dsir_weights(
        target,
        raw,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
        hash_fn=hash_fn,
        _raw_hist=raw_hist,
    )
    scored = g.join(F.broadcast(weights), "bucket", "left")
    agg = scored.groupBy(doc_col).agg(
        F.sum("_n").alias("n_features"),
        F.round(F.sum(F.col("lw") * F.col("_n")), 6).alias("log_weight"),
        F.round(
            F.sum(F.col("lw") * F.col("_n")) / F.sum("_n"), 6
        ).alias("avg_log_weight"),
    )
    spine = raw.select(doc_col)
    return spine.join(agg, doc_col, "left").select(
        doc_col,
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        "log_weight",
        "avg_log_weight",
    )

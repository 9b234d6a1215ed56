"""T115 — b-bit minwise hashing (Li & König, WWW 2010 / CACM 2011):
store only the lowest ``b`` bits of each minhash value and correct the
matched fraction for accidental collisions.

Why this matters at 100 TB: T1's minhash index stores m×8 bytes per
document (m=64 → 512 B/doc → ~5 TB of signature index at 10^10 docs).
Keeping b=2 bits per hash cuts that 32× (16 B/doc packed) at a known,
bounded variance cost — the paper's headline result is that for
high-similarity thresholds the b=1..2 estimator needs only modestly
more hashes to match the full-width accuracy, so the stored index
shrinks by an order of magnitude for free.

Estimator: for two sets with resemblance R, the probability that the
b-bit values of one minwise hash agree is  P = C + (1 − C)·R  with
C = 2^(−b) (the paper's eq. 3.1 in its r1,r2→0 limit — exact for the
universe-hashed splitmix values used here, where the full 64-bit
minhash collides only when the shingle sets pick the same minimum).
Inverting:  R̂ = (P̂ − C) / (1 − C),  clamped at 0 (P̂ below the
collision floor is noise, not negative similarity).

Plan shape — the whole point is that NOTHING new shuffles:

* signatures come from T1's fused Arrow kernel (`minhash_signatures`,
  with_bands=True) — zero extra passes; the b-bit mask is one JVM
  ``transform`` over the in-row array (no Python, no exchange);
* candidates come from the SAME band join as T1 (band hashes are
  computed from the full-width values at index time, exactly how a
  production index banks them before compressing the stored sigs);
* the verify stage compares the masked arrays via the same slim
  re-attach joins as `lsh_candidate_pairs`, then applies the
  closed-form correction as one projection.

The DuckDB oracle reuses the independent row-at-a-time minhash
reference (oracle_refs.materialize_minhash_oracle) and applies the
mask + correction in plain SQL, so kernel, banding, masking, AND the
estimator algebra are each cross-checked.

Reference anchor: none (warcsum dedups on exact payload digests,
warccollres.c); §2.12 near-dup storage tier, sibling of T1/T62.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)


def bbit_minhash_duplicates(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    b: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_bands, est_jaccard) near-dup pairs where the
    verify stage sees only the lowest ``b`` bits of each minhash.
    ``est_jaccard`` is the collision-corrected estimate, round-6,
    filtered at ``threshold``; candidates come from full-width LSH
    bands (banked before compression, the production index layout)."""
    if not 1 <= b <= 63:
        raise ValueError(f"b must be in [1, 63], got {b}")
    sig = minhash_signatures(
        docs, k, num_hashes, id_col, text_col, with_bands=True, bands=bands
    )
    mask = (1 << b) - 1
    # the stored tier: lowest b bits only; one in-row JVM transform
    sig_b = sig.withColumn(
        "sig", F.transform("sig", lambda x: x.bitwiseAND(F.lit(mask)))
    )
    # est_jaccard out of the band machinery == P̂, the raw matched
    # fraction of b-bit values over the candidate pairs
    raw = lsh_candidate_pairs(sig_b, bands)
    c = 1.0 / float(1 << b)
    corrected = F.round(
        F.greatest(
            (F.col("est_jaccard") - F.lit(c)) / F.lit(1.0 - c), F.lit(0.0)
        ),
        6,
    )
    return (
        raw.withColumn("est_jaccard", corrected)
        .filter(F.col("est_jaccard") >= threshold)
    )


def bbit_oracle_sql(
    sig_path: str,
    band_path: str,
    num_hashes: int = 64,
    b: int = 2,
    threshold: float = 0.5,
) -> str:
    """DuckDB replica over the independent per-row minhash reference
    parquet: band join for candidates, b-bit mask on the stored
    signature values, matched fraction, then the same closed-form
    collision correction and round-6 threshold."""
    mask = (1 << b) - 1
    c = 1.0 / float(1 << b)
    return f"""
WITH cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM read_parquet('{band_path}') a
  JOIN read_parquet('{band_path}') b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), matched AS (
  SELECT cand.doc_a, cand.doc_b, cand.n_bands,
         sum(CASE WHEN (sa.sig_val & {mask}) = (sb.sig_val & {mask})
                  THEN 1 ELSE 0 END)
           / CAST({num_hashes} AS DOUBLE) AS p_hat
  FROM cand
  JOIN read_parquet('{sig_path}') sa ON sa.doc_id = cand.doc_a
  JOIN read_parquet('{sig_path}') sb
    ON sb.doc_id = cand.doc_b AND sb.pos = sa.pos
  GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, n_bands,
       round(greatest((p_hat - {c!r}) / (1.0 - {c!r}), 0.0), 6)
         AS est_jaccard
FROM matched
WHERE round(greatest((p_hat - {c!r}) / (1.0 - {c!r}), 0.0), 6)
      >= {threshold!r}
"""

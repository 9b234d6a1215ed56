"""T118 — edit-distance verification tier over MinHash-LSH candidates
(Wagner & Fischer JACM 1974 for the distance; Xiao, Wang & Lin,
Ed-Join, PVLDB 2008 for the candidate-then-verify edit-similarity-join
architecture; Navarro ACM CS 2001 surveys the banded/thresholded DP
variants the production fast path uses).

Why a second verify tier when T1 already estimates Jaccard: shingle
Jaccard is ORDER-BLIND — two pages built from the same word multiset
in a different arrangement estimate as near-identical, and boilerplate
with a few swapped slots (mirror farms, templated spam) inflates it.
Normalized edit distance is order-exact, so it is the standard final
arbiter before a destructive dedup drop: LSH proposes, Levenshtein
disposes. The composition is the classic similarity-join shape —
sub-quadratic candidate generation, exact verification confined to the
candidate set.

Plan shape / 100 TB stance:

* candidates come from T1's band join unchanged (slim 24-byte rows,
  never the signature array, never text);
* the verify stage is the ONLY place document text moves, and the
  movement is bounded by the CANDIDATE set, not the corpus: candidate
  doc ids (a pair-table projection, tiny) are semi-joined against the
  corpus first, so the two text-attach joins shuffle only documents
  that appear in at least one pair;
* the distance itself is the JVM built-in ``levenshtein`` — codegen'd
  columnar, no Python. Cost is O(|a|·|b|) per PAIR, linear in the
  candidate count; at production scale the same expression takes the
  early-exit threshold argument (``levenshtein(a, b, k)`` → −1 past
  k, a banded DP that drops the per-pair cost to O(k·min(|a|,|b|)))
  — not used here because the DuckDB twin has no thresholded form,
  and the gate compares full distances.

Cross-engine contract: Spark's levenshtein counts CODEPOINT edits,
DuckDB's counts BYTE edits — identical exactly on ASCII. The driver
query therefore gates both engines to the ASCII subset
(``octet_length = length``; a no-op on the synthetic corpus, explicit
so the oracle stays exact if the corpus grows multibyte text), while
pytest pins the engine's multibyte behavior against a Python
codepoint-DP twin — the engine semantics are Unicode-correct, the
SQL twin is certified where byte≡codepoint.

Reference anchor: none (warcsum stops at exact payload digests,
warcsum.c:881–1011); §2.12 near-dup verification tier, sibling of
T1/T50/T115.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)


def edit_verified_duplicates(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_bands, est_jaccard, edit_distance, edit_ratio)
    for every LSH candidate pair whose normalized edit distance passes
    the verify gate.

    ``edit_distance`` is the exact Levenshtein distance (integer —
    cross-engine bit-free); ``edit_ratio`` = distance / max(len_a,
    len_b, 1), the ONE IEEE division, rounded to 6; pairs with
    ``edit_ratio`` ≤ ``max_ratio`` survive. The max-length denominator
    makes the ratio symmetric and ≤ 1 (distance never exceeds the
    longer length), and the floor of 1 pins the two-empty-docs case to
    ratio 0 instead of NULL.
    """
    if not 0.0 <= max_ratio <= 1.0:
        raise ValueError(f"max_ratio must be in [0, 1], got {max_ratio}")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    sig = minhash_signatures(
        base, k, num_hashes, "doc_id", "text", with_bands=True, bands=bands
    )
    # the pair table is consumed by THREE plan branches (both id
    # projections feeding the semi-join, plus the verify join chain);
    # uncached, each branch re-runs the whole band self-join + estimate
    # attach, exploding the plan to hundreds of Exchange/Python nodes
    cand = lsh_candidate_pairs(sig, bands).cache()
    # verify-tier text movement is candidate-bounded: only docs that
    # appear in some pair are pulled through the attach joins
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # candidate texts feed both attach sides — cache so the corpus scan +
    # semi-join run once, not once per side
    ctext = base.join(F.broadcast(cand_ids), "doc_id", "left_semi").cache()
    ta = ctext.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = ctext.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    dist = F.levenshtein("text_a", "text_b")
    denom = F.greatest(
        F.length("text_a"), F.length("text_b"), F.lit(1)
    ).cast("double")
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("edit_distance", dist)
        .withColumn("edit_ratio", F.round(F.col("edit_distance") / denom, 6))
        .filter(F.col("edit_ratio") <= F.lit(max_ratio))
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            "est_jaccard",
            "edit_distance",
            "edit_ratio",
        )
    )


def edit_verified_oracle_sql(
    sig_path: str,
    band_path: str,
    corpus_sql: str,
    num_hashes: int = 64,
    max_ratio: float = 0.5,
) -> str:
    """DuckDB replica: candidates + estimate from the independent
    per-row minhash reference parquet (the T1 oracle discipline), text
    re-attached from ``corpus_sql`` (a SELECT yielding doc_id, text —
    MUST synthesize the same corpus the engine query ran on), distance
    via DuckDB's byte-based levenshtein — exact vs the engine's
    codepoint distance because the corpus SQL gates to ASCII."""
    return f"""
WITH corpus AS ({corpus_sql}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM read_parquet('{band_path}') a
  JOIN read_parquet('{band_path}') b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), est AS (
  SELECT cand.doc_a, cand.doc_b, cand.n_bands,
         round(sum(CASE WHEN sa.sig_val = sb.sig_val THEN 1 ELSE 0 END)
               / CAST({num_hashes} AS DOUBLE), 6) AS est_jaccard
  FROM cand
  JOIN read_parquet('{sig_path}') sa ON sa.doc_id = cand.doc_a
  JOIN read_parquet('{sig_path}') sb
    ON sb.doc_id = cand.doc_b AND sb.pos = sa.pos
  GROUP BY 1, 2, 3
)
SELECT e.doc_a, e.doc_b, e.n_bands, e.est_jaccard,
       levenshtein(da.text, db.text) AS edit_distance,
       round(levenshtein(da.text, db.text)
             / CAST(greatest(length(da.text), length(db.text), 1)
                    AS DOUBLE), 6) AS edit_ratio
FROM est e
JOIN corpus da ON da.doc_id = e.doc_a
JOIN corpus db ON db.doc_id = e.doc_b
WHERE round(levenshtein(da.text, db.text)
            / CAST(greatest(length(da.text), length(db.text), 1)
                   AS DOUBLE), 6) <= {max_ratio!r}
"""

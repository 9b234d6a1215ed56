"""T94 — KMV (k-minimum-values) sketches for cross-corpus overlap:
distinct counts, union size, and Jaccard/containment between two
crawls WITHOUT a corpus-×-corpus join (Bar-Yossef et al. RANDOM 2002
for the (k−1)/v_k distinct estimator; Beyer et al. SIGMOD 2007 for the
mergeable multi-set form and the Jaccard estimator).

Why the engine wants it: "how much of crawl B is already in crawl A"
is the first question asked before merging snapshots, buying a crawl,
or deduplicating across corpora — and answering it exactly means a
10^10 × 10^10 join. The KMV answer ships two k-row tables. It
complements T43 (HLL: cardinality of ONE set; intersections only via
inclusion-exclusion error blowup) — KMV supports intersection/Jaccard
natively because the sketches themselves intersect meaningfully.

Pinned, engine-portable semantics (no RNG anywhere — the repo's
sketch discipline):

* ``h(doc) = md5(text)`` hex — lexicographic order on the fixed-width
  hex string == numeric order on the 128-bit value (the shuffle.py
  precedent); distinct values only (KMV is a DISTINCT-value sketch);
* ``sketch_k(S)`` = the k smallest distinct hashes of S;
* merge property (what makes it a sketch): the k smallest of
  ``sketch(A) ∪ sketch(B)`` IS ``sketch(A ∪ B)`` — exact, not
  approximate;
* ``est_distinct = (k−1) / v_k`` where ``v_k`` is the k-th smallest
  hash mapped to (0,1) — here the EXACT dyadic fraction from the
  first 13 hex digits (52 bits), one IEEE division (the psample.py
  bit-exactness trick); sketches with fewer than k values are exact:
  ``est_distinct = |sketch|``;
* Jaccard: ``J = |{v ∈ sketch_k(A∪B) : v ∈ sketch(A) ∧ v ∈
  sketch(B)}| / k'`` with ``k' = min(k, |sketch(A∪B)|)`` (Beyer's
  unbiased form); ``est_intersection = round(J · est_union)``;
  containment of B in A = est_intersection / est_distinct(B).

Plan shape at 100 TB: each corpus is scanned ONCE, map-only, into
hashes; the bottom-k is a distributed ``orderBy().limit(k)``
(TakeOrderedAndProject — per-partition top-k then a k·partitions
merge, never a global sort); everything downstream operates on k-row
dimension tables with broadcast joins. The corpora never shuffle and
never meet each other.

No reference counterpart (warcsum compares digests within one run);
the estimators are the published ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 52-bit dyadic mapping of a hex hash into (0,1) — exact in a double
_FRAC_BITS = 52
_FRAC_DIV = float(1 << _FRAC_BITS)


def kmv_sketch(
    docs: DataFrame,
    k: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """(h): the k smallest distinct md5 hex hashes of ``text_col`` —
    a k-row dimension table. Distinct BEFORE the top-k (duplicate
    texts are one value by definition)."""
    hashed = docs.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("h")
    ).distinct()
    return hashed.orderBy("h").limit(k)


def _frac(h):
    """exact (0,1] fraction from the first 13 hex digits — the
    psample.py (v+1)/2^52 discipline, bit-identical cross-engine."""
    v = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    return (v + F.lit(1)).cast("double") / F.lit(_FRAC_DIV)


def _frac_sql(v: str) -> str:
    """the identical fraction for DuckDB over an existing hex column —
    strpos digit arithmetic (the bucket_sql idiom), exact BIGINT, one
    division."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({v}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"(CAST(({digits}) + 1 AS DOUBLE) / {_FRAC_DIV!r})"


def kmv_overlap(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """ONE row: (k, n_a, n_b, est_distinct_a, est_distinct_b,
    est_union, jaccard, est_intersection, containment_b_in_a) from two
    ``kmv_sketch(k)`` tables. All arithmetic on ≤2k rows."""
    a = sketch_a.select(F.col("h").alias("h"), F.lit(1).alias("_a"))
    b = sketch_b.select(F.col("h").alias("h"), F.lit(1).alias("_b"))
    merged = (
        a.join(b, "h", "full_outer")
        .orderBy("h")
        .limit(k)
        .select(
            "h",
            F.coalesce(F.col("_a"), F.lit(0)).alias("_a"),
            F.coalesce(F.col("_b"), F.lit(0)).alias("_b"),
        )
    )

    def est(sk: DataFrame, name: str) -> DataFrame:
        agg = sk.agg(
            F.count("*").alias("_n"), F.max("h").alias("_vk")
        )
        return agg.select(
            F.col("_n").alias(f"n_{name}"),
            F.when(F.col("_n") < k, F.col("_n").cast("double"))
            .otherwise(
                F.round((F.lit(float(k - 1))) / _frac(F.col("_vk")), 3)
            )
            .alias(f"est_distinct_{name}"),
        )

    ea = est(sketch_a, "a")
    eb = est(sketch_b, "b")
    eu = merged.agg(
        F.count("*").alias("_ku"),
        F.max("h").alias("_vku"),
        F.sum(
            F.when((F.col("_a") == 1) & (F.col("_b") == 1), 1).otherwise(0)
        ).alias("_both"),
    ).select(
        F.col("_ku"),
        F.col("_both"),
        F.when(F.col("_ku") < k, F.col("_ku").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) / _frac(F.col("_vku")), 3))
        .alias("est_union"),
    )
    row = ea.crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(eu))
    jac = F.round(
        F.col("_both").cast("double") / F.col("_ku").cast("double"), 6
    )
    inter = F.round(
        (F.col("_both").cast("double") / F.col("_ku").cast("double"))
        * F.col("est_union")
    ).cast("long")
    return row.select(
        F.lit(k).alias("k"),
        "n_a",
        "n_b",
        "est_distinct_a",
        "est_distinct_b",
        "est_union",
        jac.alias("jaccard"),
        inter.alias("est_intersection"),
        F.round(
            inter.cast("double") / F.col("est_distinct_b"), 6
        ).alias("containment_b_in_a"),
    )


def kmv_overlap_sql(
    corpus_a_sql: str,
    corpus_b_sql: str,
    k: int = 256,
) -> str:
    """The IDENTICAL pinned estimators for DuckDB; ``corpus_X_sql``
    selects one ``text`` column per corpus."""
    def sk(name: str, src: str) -> str:
        return (
            f"{name} AS (SELECT DISTINCT md5(coalesce(text, '')) AS h"
            f" FROM ({src}) ORDER BY h LIMIT {k})"
        )

    est = (
        "CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE)"
        " ELSE round(CAST({km1} AS DOUBLE) / {f}, 3) END"
    )
    return f"""
WITH {sk('sk_a', corpus_a_sql)}, {sk('sk_b', corpus_b_sql)},
uni AS (
  SELECT h,
    max(CASE WHEN src = 'a' THEN 1 ELSE 0 END) AS in_a,
    max(CASE WHEN src = 'b' THEN 1 ELSE 0 END) AS in_b
  FROM (SELECT h, 'a' AS src FROM sk_a
        UNION ALL SELECT h, 'b' FROM sk_b)
  GROUP BY h
), merged AS (
  SELECT * FROM uni ORDER BY h LIMIT {k}
), s AS (
  SELECT (SELECT count(*) FROM sk_a) AS n_a,
         (SELECT count(*) FROM sk_b) AS n_b,
         (SELECT max(h) FROM sk_a) AS vka,
         (SELECT max(h) FROM sk_b) AS vkb,
         (SELECT max(h) FROM merged) AS vku,
         (SELECT count(*) FROM merged) AS ku,
         (SELECT sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
          FROM merged) AS nboth
), e AS (
  SELECT n_a, n_b, ku, nboth,
    {est.format(n='n_a', k=k, km1=k - 1, f=_frac_sql('vka'))}
      AS est_distinct_a,
    {est.format(n='n_b', k=k, km1=k - 1, f=_frac_sql('vkb'))}
      AS est_distinct_b,
    {est.format(n='ku', k=k, km1=k - 1, f=_frac_sql('vku'))}
      AS est_union
  FROM s
)
SELECT {k} AS k, n_a, n_b, est_distinct_a, est_distinct_b, est_union,
  round(CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE), 6) AS jaccard,
  CAST(round((CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE)) * est_union)
       AS BIGINT) AS est_intersection,
  round(CAST(round((CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE))
                   * est_union) AS BIGINT)
        / est_distinct_b, 6) AS containment_b_in_a
FROM e
"""

"""T92 — posting-list compression cost accounting (Elias γ/δ gap codes,
Elias IEEE-IT 1975; variable-byte; the standard index-compression
analysis of Witten, Moffat & Bell, "Managing Gigabytes" ch. 3).

Why the engine wants it: T30 materializes the inverted index; the
question a 10^10-document deployment actually asks about that index is
"what does it COST to store and ship?". Gap (d-gap) coding is how real
indexes store postings, and the γ/δ/vbyte bit totals per term are the
textbook planning numbers — they decide codec choice, shard budgets,
and whether hot terms are worth sharding. Computing them needs no
codec implementation: code lengths are closed-form in the gap widths,
so the whole account is exact integer arithmetic.

Pinned, engine-portable definitions (postings are ascending distinct
non-negative ids — the build_inverted_index output contract):

* gaps: ``g_1 = p_1 + 1`` (ids are 0-based; +1 makes every code input
  ≥ 1), ``g_i = p_i − p_{i−1}`` (≥ 1 by distinctness);
* ``width(g) = length(bin(g))`` — the minimal binary width; both
  engines' ``bin`` emit no leading zeros;
* ``γ_bits(g)  = 2·(width−1) + 1``;
* ``δ_bits(g)  = (width−1) + γ_bits(width) = (width−1)
  + 2·(length(bin(width))−1) + 1``;
* ``vbyte_bits(g) = 8·⌈width/7⌉``;
* per term: totals over the gap list, ``raw_bits = 64·df`` (the
  uncompressed BIGINT baseline), and
  ``gamma_ratio = round(γ_bits / raw_bits, 6)`` — ONE pinned IEEE
  division. Terms whose posting list was structurally skipped by T30's
  hot-term cap carry NULL costs (their df/cf stay exact upstream).

Spark-first plan: **entirely row-local** — gaps via an indexed
``transform`` over the postings array, per-code bit maps as nested
``transform``s, totals via ``aggregate``; zero exchanges beyond
whatever built the index, zero Python, exact integers throughout (the
one double is the final ratio). At 100 TB the index table is
vocabulary-sized and this pass streams over it.

No reference counterpart (warcsum has no index layer); the code-length
formulas are the published ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: uncompressed baseline: one BIGINT per posting
RAW_BITS_PER_POSTING = 64


def _width(g: Column) -> Column:
    """minimal binary width of g ≥ 1 — length(bin(g)), exact."""
    return F.length(F.bin(g))


def _gamma_bits(width: Column) -> Column:
    return (F.lit(2) * (width - 1) + 1).cast("long")


def _delta_bits(width: Column) -> Column:
    return (
        (width - 1) + (F.lit(2) * (F.length(F.bin(width)) - 1) + 1)
    ).cast("long")


def _vbyte_bits(width: Column) -> Column:
    return (F.floor((width + F.lit(6)) / F.lit(7)).cast("long") * 8)


def postings_compression(
    index: DataFrame,
    postings_col: str = "postings",
) -> DataFrame:
    """(…index columns sans postings…, n_postings, raw_bits,
    gamma_bits, delta_bits, vbyte_bits, gamma_ratio) — see module
    docstring. NULL postings (T30 hot-term cap) → NULL costs."""
    p = F.col(postings_col)
    gaps = F.transform(
        p,
        lambda x, i: x
        - F.when(i == F.lit(0), F.lit(-1)).otherwise(F.get(p, i - 1)),
    )
    zero = F.lit(0).cast("long")

    def total(bit_fn) -> Column:
        return F.aggregate(
            F.transform(gaps, lambda g: bit_fn(_width(g))),
            zero,
            lambda acc, x: acc + x,
        )

    carry = [c for c in index.columns if c != postings_col]
    n = F.size(p).cast("long")
    gamma = total(_gamma_bits)
    out = index.select(
        *carry,
        F.when(p.isNotNull(), n).alias("n_postings"),
        F.when(p.isNotNull(), n * RAW_BITS_PER_POSTING).alias("raw_bits"),
        F.when(p.isNotNull(), gamma).alias("gamma_bits"),
        F.when(p.isNotNull(), total(_delta_bits)).alias("delta_bits"),
        F.when(p.isNotNull(), total(_vbyte_bits)).alias("vbyte_bits"),
        F.when(
            p.isNotNull() & (n > 0),
            F.round(
                gamma.cast("double")
                / (n * RAW_BITS_PER_POSTING).cast("double"),
                6,
            ),
        ).alias("gamma_ratio"),
    )
    return out


def postings_compression_sql(index_cte: str) -> str:
    """The same account for DuckDB over ``index_cte`` — a named CTE
    body (``name AS (SELECT … term, df, cf, postings …)``) whose
    ``postings`` is a BIGINT list (NULL for capped terms). Gap/width
    mechanics differ (unnest + lag — the oracle is free to use
    different plumbing), the ARITHMETIC is the pinned closed forms."""
    name = index_cte.split(" AS ", 1)[0].strip()
    return f"""
WITH {index_cte}, expl AS (
  SELECT term, unnest(postings) AS p,
         generate_subscripts(postings, 1) AS i
  FROM {name} WHERE postings IS NOT NULL
), gaps AS (
  SELECT term,
         p - coalesce(lag(p) OVER (PARTITION BY term ORDER BY i), -1)
           AS g
  FROM expl
), bits AS (
  SELECT term,
         length(bin(g)) AS w
  FROM gaps
), per_term AS (
  SELECT term,
    CAST(sum(2 * (w - 1) + 1) AS BIGINT) AS gamma_bits,
    CAST(sum((w - 1) + (2 * (length(bin(w)) - 1) + 1)) AS BIGINT)
      AS delta_bits,
    CAST(sum(((w + 6) // 7) * 8) AS BIGINT) AS vbyte_bits
  FROM bits GROUP BY term
)
SELECT ix.term, ix.df, ix.cf,
  CASE WHEN ix.postings IS NOT NULL
       THEN CAST(len(ix.postings) AS BIGINT) END AS n_postings,
  CASE WHEN ix.postings IS NOT NULL
       THEN CAST(len(ix.postings) * {RAW_BITS_PER_POSTING} AS BIGINT)
  END AS raw_bits,
  pt.gamma_bits, pt.delta_bits, pt.vbyte_bits,
  CASE WHEN ix.postings IS NOT NULL AND len(ix.postings) > 0
       THEN round(CAST(pt.gamma_bits AS DOUBLE)
                  / CAST(CAST(len(ix.postings) * {RAW_BITS_PER_POSTING}
                              AS BIGINT) AS DOUBLE), 6)
  END AS gamma_ratio
FROM {name} ix LEFT JOIN per_term pt USING (term)
"""

"""T104 — UniMax language-budget allocation (Chung, Constant, Garcia &
Firat et al., "UniMax: Fairer and More Effective Language Sampling for
Large-Scale Multilingual Pretraining", ICLR 2023).

The sampling policy that replaced temperature mixing (T20/T72) for
multilingual pretraining corpora: give every language a UNIFORM share
of the training budget, except that no language may be repeated for
more than ``max_epochs`` epochs — head languages are never starved,
tail languages are never memorized. The allocation is classic
waterfilling and has a closed form, so it needs no iteration:

* capacity ``c_i = size_i * max_epochs`` (the most budget language
  ``i`` can absorb under the epoch cap; exact integers — pinned:
  ``max_epochs`` is an int here, the paper's grid uses small integer
  caps);
* sort languages ASCENDING by ``(capacity, lang)`` (the lang
  tie-break makes the rank — and therefore the output — fully
  deterministic);
* a language is CAPPED (absorbs its whole capacity) iff
  ``c_i * (n - r_i + 1) <= B - cs_{i-1}`` where ``r_i`` is its rank,
  ``cs`` the running capacity sum and ``B`` the budget — the standard
  waterfilling prefix property: under ascending capacities the capped
  set is exactly a prefix, so the threshold rank ``t`` is a
  conditional MAX over the window (the psample.py tau trick), never a
  loop;
* capped rows get ``allocated = capacity`` (exact); the rest split
  the remainder uniformly: ``(B - cs_t) / (n - t)`` — ONE pinned IEEE
  division over exact integers, bit-identical cross-engine, rounded
  to 6; ``epochs = allocated / size`` is the second pinned division.

Budget conservation is an identity: ``sum(allocated) = cs_t +
(n - t) * u = B`` exactly (pre-rounding) whenever ``B <= sum(c)``,
and ``= sum(c)`` when the budget exceeds total capacity (every row
capped).

Plan shape at 100 TB: the language table is dimension-sized (a few
hundred rows — the corpus-grain work is the one map-side-combined
``groupBy(lang)`` in ``language_sizes``), so the unpartitioned
ordered windows here run on a dimension table by construction, the
same discipline as mixing.py's bucket totals. No Python, no collects,
no joins.

No reference counterpart; the policy is the published one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def language_sizes(
    docs: DataFrame, lang_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """(lang, size) — the ONE corpus-grain exchange (map-side
    combined); everything downstream is dimension-sized."""
    return (
        docs.select(F.col(lang_col).alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").alias("size"))
    )


def unimax_budgets(
    sizes: DataFrame,
    budget: int,
    max_epochs: int = 4,
    lang_col: str = "lang",
    size_col: str = "size",
) -> DataFrame:
    """(lang, size, capacity, allocated, epochs, capped) — the UniMax
    waterfilling allocation of ``budget`` over a (lang, size) table.
    See module docstring for the pinned closed form."""
    s = sizes.select(
        F.col(lang_col).alias("lang"),
        F.col(size_col).cast("long").alias("size"),
    )
    cap = (F.col("size") * F.lit(int(max_epochs))).cast("decimal(38,0)")
    w = Window.orderBy("capacity", "lang")
    ranked = (
        s.withColumn("capacity", cap)
        .withColumn("r", F.row_number().over(w))
        .withColumn("cs", F.sum("capacity").over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
    )
    b = F.lit(int(budget)).cast("decimal(38,0)")
    # capped iff capacity*(n-r+1) <= B - cs_{r-1}  (all exact integers)
    is_capped = (
        F.col("capacity") * (F.col("n") - F.col("r") + 1)
        <= b - (F.col("cs") - F.col("capacity"))
    )
    wall = Window.partitionBy()
    flagged = ranked.withColumn("capped", is_capped)
    t = F.coalesce(
        F.max(F.when(F.col("capped"), F.col("r"))).over(wall), F.lit(0)
    )
    cs_t = F.coalesce(
        F.max(F.when(F.col("capped"), F.col("cs"))).over(wall),
        F.lit(0).cast("decimal(38,0)"),
    )
    # uniform share for the uncapped suffix: ONE pinned IEEE division
    share = (b - cs_t).cast("double") / (F.col("n") - t).cast("double")
    alloc = F.when(
        F.col("capped"), F.col("capacity").cast("double")
    ).otherwise(F.round(share, 6))
    return flagged.select(
        "lang",
        "size",
        F.col("capacity").cast("long").alias("capacity"),
        alloc.alias("allocated"),
        F.round(alloc / F.col("size").cast("double"), 6).alias("epochs"),
        "capped",
    )


def unimax_sql(
    sizes_sql: str, budget: int, max_epochs: int = 4
) -> str:
    """The IDENTICAL pinned waterfilling for DuckDB over ``sizes_sql``
    (a SELECT producing (lang, size))."""
    return f"""
WITH s AS (SELECT lang, CAST(size AS BIGINT) AS size FROM ({sizes_sql})),
ranked AS (
  SELECT lang, size,
         CAST(size * {int(max_epochs)} AS DECIMAL(38,0)) AS capacity,
         row_number() OVER (ORDER BY CAST(size * {int(max_epochs)} AS DECIMAL(38,0)), lang) AS r,
         sum(CAST(size * {int(max_epochs)} AS DECIMAL(38,0)))
           OVER (ORDER BY CAST(size * {int(max_epochs)} AS DECIMAL(38,0)), lang) AS cs,
         count(*) OVER () AS n
  FROM s
),
flagged AS (
  SELECT *,
         capacity * (n - r + 1)
           <= CAST({int(budget)} AS DECIMAL(38,0)) - (cs - capacity) AS capped
  FROM ranked
),
thresh AS (
  SELECT *,
         coalesce(max(CASE WHEN capped THEN r END) OVER (), 0) AS t,
         coalesce(max(CASE WHEN capped THEN cs END) OVER (),
                  CAST(0 AS DECIMAL(38,0))) AS cs_t
  FROM flagged
)
SELECT lang, size, CAST(capacity AS BIGINT) AS capacity,
  CASE WHEN capped THEN CAST(capacity AS DOUBLE)
       ELSE round(CAST(CAST({int(budget)} AS DECIMAL(38,0)) - cs_t AS DOUBLE)
                  / CAST(n - t AS DOUBLE), 6) END AS allocated,
  round((CASE WHEN capped THEN CAST(capacity AS DOUBLE)
       ELSE round(CAST(CAST({int(budget)} AS DECIMAL(38,0)) - cs_t AS DOUBLE)
                  / CAST(n - t AS DOUBLE), 6) END)
        / CAST(size AS DOUBLE), 6) AS epochs,
  capped
FROM thresh
"""

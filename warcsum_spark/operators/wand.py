"""T109 — WAND / MaxScore term upper bounds over the corpus (Broder,
Carmel, Herscovici, Soffer & Zien, CIKM 2003, "Efficient query
evaluation using a two-level retrieval process"; Turtle & Flood, IPM
31(6) 1995 for the original max_score pruning).

T30 builds the inverted index and T69 evaluates BM25 by brute force;
a serving stack does neither at 10^10 documents — it prunes. Both
published prune families (WAND's pivoting, MaxScore's essential
lists) require ONE per-term statistic precomputed at index time: the
maximum score contribution any single document can draw from that
term, ``ub(t) = max_d idf(t) * TF(t, d)``. A query is then skippable
past a document whenever the sum of its terms' upper bounds can't
beat the current top-k threshold. This operator emits exactly that
sidecar table — (term, df, ub and the argmax document) — sized like
the vocabulary, i.e. a dimension table the query layer broadcasts.

Scoring matches T69 bit-for-bit (same tokenizer, same Lucene idf,
same k1/b defaults), so ``bm25_search``'s score of any (query, doc)
is ≤ the sum of the query terms' bounds by construction — the
invariant the pytest suite asserts.

Engine-portable arithmetic: ``avgdl`` is an EXACT DECIMAL(38,0) sum
of integer doclens over one pinned division (no float avg across
partitions); the tf-normalization ``TF = tf*(k1+1)/(tf + k1*(1-b +
b*doclen/avgdl))`` is rounded to 9 BEFORE the per-term max, so the
argmax comparison is over pinned values and a 1-ulp cross-engine
difference cannot flip which document holds the bound; ties take the
SMALLEST doc_id (max over (TF, -doc_id) pairs — pure max, exact and
order-independent, never a float sum); ``ub = round(idf * max_TF,
6)`` is the one ln-carrying output, T69's rounding discipline.

Plan shape at 100 TB: the token stream collapses in ONE term-keyed
exchange with full map-side combine (count for tf, max for doclen —
both combinable, so stopword skew shrinks map-side); the per-term
df/max fold is a second slim exchange on the same key; corpus
constants are a one-row broadcast (the audited normalizer pattern).
Document text never shuffles.

Reference anchor: none (§2.12 training-data surface); the pruning
bounds are the published ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.bm25 import _doc_lengths, _tokens_with_len

_DEC = "decimal(38,0)"


def wand_upper_bounds(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
) -> DataFrame:
    """(term, df, ub_doc_id, max_tf_norm, ub) per corpus term with
    df >= ``min_df`` — the WAND/MaxScore pruning sidecar. See module
    docstring for the pinned arithmetic."""
    stats = _doc_lengths(docs, id_col, text_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("doclen").cast(_DEC)).alias("_s"),
    )
    toks = _tokens_with_len(docs, id_col, text_col)
    pairs = toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.max("doclen").alias("doclen"),
    )
    avgdl = F.col("_s").cast("double") / F.col("_n").cast("double")
    tf_norm = F.round(
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doclen").cast("double") / avgdl
            )
        ),
        9,
    )
    per_term = (
        pairs.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.col(id_col),
            tf_norm.alias("_tfn"),
            F.col("_n"),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.max(
                F.struct(F.col("_tfn"), (-F.col(id_col)).alias("_nid"))
            ).alias("_m"),
            F.first("_n").alias("_n"),
        )
        .filter(F.col("df") >= min_df)
    )
    nd = F.col("_n").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    return per_term.select(
        "term",
        "df",
        (-F.col("_m._nid")).alias("ub_doc_id"),
        F.col("_m._tfn").alias("max_tf_norm"),
        F.round(idf * F.col("_m._tfn"), 6).alias("ub"),
    )


def wand_upper_bounds_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
) -> str:
    """The IDENTICAL pinned arithmetic for DuckDB (T69's oracle
    tokenization verbatim); ``docs_sql`` yields (id, text) rows."""
    k1r, br = repr(float(k1)), repr(float(b))
    return rf"""
WITH norm AS (
  SELECT {id_col} AS doc_id,
         trim(regexp_replace(lower({text_col}), '[ \t\n\x0b\f\r]+', ' ', 'g'))
           AS t
  FROM ({docs_sql})
), toks AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(t, ' ') END AS w
  FROM norm
), dl AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS doclen FROM toks
), stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(doclen AS HUGEINT)) AS s
  FROM dl
), stream AS (
  SELECT doc_id, unnest(w) AS term FROM toks
), pairs AS (
  SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf
  FROM stream GROUP BY term, doc_id
), tfn AS (
  SELECT p.term, p.doc_id, stats.n,
    round(p.tf * ({k1r} + 1.0)
          / (p.tf + {k1r} * (1.0 - {br} + {br} * CAST(dl.doclen AS DOUBLE)
             / (CAST(stats.s AS DOUBLE) / CAST(stats.n AS DOUBLE)))), 9)
      AS tfn
  FROM pairs p JOIN dl USING (doc_id) CROSS JOIN stats
), ranked AS (
  SELECT term, doc_id, tfn, n,
         row_number() OVER (
           PARTITION BY term ORDER BY tfn DESC, doc_id ASC
         ) AS r,
         count(*) OVER (PARTITION BY term) AS df
  FROM tfn
)
SELECT term, CAST(df AS BIGINT) AS df,
  doc_id AS ub_doc_id,
  tfn AS max_tf_norm,
  round(ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
           / (CAST(df AS DOUBLE) + 0.5) + 1.0) * tfn, 6) AS ub
FROM ranked WHERE r = 1 AND df >= {int(min_df)}
"""

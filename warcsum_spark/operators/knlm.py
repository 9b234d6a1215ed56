"""T88 — interpolated Kneser-Ney bigram LM training over the corpus.

The training half of the repo's language-model surface: T39
(lm_score.py) scores documents under a GIVEN n-gram model; this trains
that model from the corpus, the way the CCNet pipeline trains a KenLM
on a clean reference corpus before perplexity-bucketing the crawl
(Wenzek et al. LREC 2020, §3.3; smoothing per Kneser & Ney ICASSP 1995
in the interpolated form of Chen & Goodman, Computer Speech & Language
1999, eq. 20):

    p(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
             + (D · N1+(w1·) / c(w1)) · p_cont(w2)
    p_cont(w2) = N1+(·w2) / N1+(··)

with fixed discount D (0.75, the textbook value), where N1+(w1·) is
the number of distinct continuations of w1, N1+(·w2) the number of
distinct left contexts of w2, and N1+(··) the number of distinct
bigram types. The continuation distribution — "how many contexts has
this word completed" rather than "how often has it occurred" — is the
entire point of KN: frequent-but-context-bound words (the "Francisco"
example) get small backoff mass.

Everything is a count: ONE corpus-grain exchange (the shared
pair_counts table from collocations.py — whitespace-normalized
lowercase adjacency pairs, document-final tokens marked w2=NULL, lazily
localCheckpointed since three consumers branch over it), then
vocab-grain aggregations and joins only. The probability is a single
pinned expression over integers —

    greatest(c12 - D, 0) / c1 + ((D · n1p) / c1) · (nc / nbt)

— evaluated with that exact association on both engines, so Spark and
the generated DuckDB twin produce bit-identical doubles (the PMI
precedent, collocations.py). Mass conservation is an output-level
invariant: for every context w1, Σ_w2 (c12-D)/c1 + D·n1p/c1 = 1
(because Σ nc = nbt ⇒ Σ p_cont = 1), which pytest pins.

Plan shape at 100 TB: identical to PMI — the only corpus-sized step is
the map-side-combinable pair groupBy (Zipfian keys collapse in the
partial agg); the model table is unique-bigram sized and joins against
two unigram-grain aggregates plus a one-row broadcast total (the
tfidf.py normalizer pattern, not a data×data cartesian).

Reference anchor: no LM surface in the reference engine (warcsum.c);
§2.12 training-data frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.collocations import pair_counts


def kn_bigram_lm(
    docs: DataFrame,
    discount: float = 0.75,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, c12, c1, n1p, nc, prob): the interpolated-KN bigram
    model over every observed bigram with c12 >= ``min_count`` (the
    filter trims the OUTPUT; all counts and normalizers are computed
    from the full corpus first). prob is rounded to 6 places after the
    pinned expression; the integer columns are exact."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    pc = pair_counts(docs, text_col)
    bi = pc.filter(F.col("w2").isNotNull()).withColumnRenamed("c", "c12")
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1p")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("nc"))
    tot = bi.agg(F.count("*").alias("nbt"))
    d = F.lit(discount)
    # pinned association — see module docstring (oracle bit-parity)
    prob = F.greatest(
        F.col("c12").cast("double") - d, F.lit(0.0)
    ) / F.col("c1") + ((d * F.col("n1p")) / F.col("c1")) * (
        F.col("nc").cast("double") / F.col("nbt")
    )
    return (
        bi.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c12") >= min_count)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("n1p").cast("long").alias("n1p"),
            F.col("nc").cast("long").alias("nc"),
            F.round(prob, 6).alias("prob"),
        )
    )


def kn_bigram_sql(
    source_cte: str,
    ws_class: str,
    discount: float = 0.75,
    min_count: int = 1,
) -> str:
    """The identical training as DuckDB SQL for the driver gate —
    generated beside the implementation so the two cannot drift.
    ``source_cte`` must define ``src(text)``; ``ws_class`` is the
    engine's whitespace character class (functions/quality.py::WS_CLASS
    — imported by the caller, not re-typed, so the tokenization
    contract is shared with PMI/TF-IDF/BM25)."""
    return f"""
WITH {source_cte},
staged AS (
  SELECT regexp_replace(regexp_replace(lower(text),
           '{ws_class}+', ' ', 'g'), '^ | $', '', 'g') AS norm
  FROM src
), wsrc AS (
  SELECT string_split(norm, ' ') AS words FROM staged WHERE norm <> ''
), ex AS (
  SELECT words[i] AS w1, words[i + 1] AS w2
  FROM (SELECT words, unnest(generate_series(1, len(words))) AS i
        FROM wsrc)
), bi AS (
  SELECT w1, w2, count(*) AS c12 FROM ex
  WHERE w2 IS NOT NULL GROUP BY w1, w2
), ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1p
  FROM bi GROUP BY w1
), cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM bi GROUP BY w2
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nbt FROM bi
)
SELECT b.w1, b.w2,
       CAST(b.c12 AS BIGINT) AS c12, ctx.c1, ctx.n1p, cont.nc,
       round(
         greatest(CAST(b.c12 AS DOUBLE) - {discount!r}, 0.0) / ctx.c1
         + (({discount!r} * ctx.n1p) / ctx.c1)
           * (CAST(cont.nc AS DOUBLE) / nbt),
         6) AS prob
FROM bi b
JOIN ctx USING (w1)
JOIN cont USING (w2)
CROSS JOIN tot
WHERE b.c12 >= {min_count}
"""

"""T69 — BM25 ranked retrieval: evaluate keyword queries against the
corpus and return the top-k documents per query (Robertson/Sparck-Jones
probabilistic weighting with the Lucene non-negative idf).

This is the query-evaluation counterpart of T30's inverted-index BUILD:
an index materializes term→postings; this operator answers "given these
query terms, which documents rank highest" in one pass over the corpus,
which is how ad-hoc retrieval (quality-audit sampling, decontamination
triage, "show me pages about X" corpus exploration) actually runs on an
engine that has the raw pages but no serving stack.

Scale design:

* **The token stream is pre-filtered by a BROADCAST semi-join on the
  query vocabulary before the only token-grain exchange.** Query
  vocabularies are dimension-sized (dozens of terms); the broadcast
  hash join drops every non-query token map-side, so the (term, doc)
  aggregation shuffles only matching tokens — at web scale that is the
  difference between shuffling 10^13 tokens and 10^8.
* **tf and doclen share that one exchange**: document length rides the
  explode as a column and collapses with ``max`` in the same map-side
  combine that counts tf. No second pass over text, no doc-length join.
* **Corpus constants (N, avgdl) are a one-row aggregate broadcast back**
  (the hits.py normalizer pattern) — never a ``collect``.
* **df comes from the filtered pair table** (filtering on term keeps
  every document of a surviving term, so df is exact) and is itself
  query-vocabulary-sized → broadcast back. Zero dimension shuffles.
* **Scoring is one slim (query_id, doc_id) exchange**; the per-query
  top-k supports the politeness two-phase salted trim
  (``salt_buckets``) because a stopword-grade query term makes its
  query a hot window key — the same skew the frontier scheduler
  already solves.

Float pinning follows lm_score.py's discipline: doubles all the way,
``round(score, 6)`` at the OUTPUT only (libm-ulp + sum-order noise is
~1e-13, absorbed by round-6; per-term rounding would park sums on
round-half boundaries), and the rank window orders by the ROUNDED
score with a doc_id tiebreak so ordering is engine-exact.

Reference anchor: no counterpart in the reference engine (its unit is
the WARC record, warcsum.c:881–1011); §2.12 training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens_with_len(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, doclen, term) token stream — lowercased whitespace tokens,
    the lm_score.py tokenization (shared so retrieval and LM scoring
    agree on what a term is)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[ \t\n\x0b\f\r]+", " ")
    )
    words = F.when(
        norm == "", F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))
    # Materialize the token array in a projection BELOW the Generate:
    # sibling expressions of an explode land in a Project ABOVE it and
    # are evaluated per OUTPUT row, so size() over the raw words
    # expression re-runs regexp_replace+split once per token — O(len²)
    # per document. With the array as a child attribute, the regex runs
    # once per doc and the per-token size() is an O(1) length read.
    arr = docs.select(F.col(id_col), words.alias("_w"))
    return arr.select(
        F.col(id_col),
        F.size("_w").cast("long").alias("doclen"),
        F.explode("_w").alias("term"),
    )


def _doc_lengths(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[ \t\n\x0b\f\r]+", " ")
    )
    n = F.when(norm == "", F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
    return docs.select(F.col(id_col), n.cast("long").alias("doclen"))


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    salt_buckets: int = 0,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is a dimension-sized (query_id, term) table — one row
    per query term, terms already in the corpus tokenization (lowercase
    whitespace tokens). Returns (query_id, doc_id, score, rank) with
    ``score = round(Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·doclen/avgdl)), 6)``
    and ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`` (Lucene form,
    always positive). Ranks are dense 1..k per query, ordered by
    (score DESC, doc_id ASC) on the rounded score.

    ``salt_buckets`` > 0 enables the two-phase skew-safe top-k for hot
    (stopword-grade) queries, same contract as
    frontier/politeness.py::schedule_per_host.
    """
    qterms = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").cast("string").alias("term"),
    )
    vocab = qterms.select("term").distinct()

    # corpus constants: one-row aggregate, broadcast back — never collect
    stats = (
        _doc_lengths(docs, id_col, text_col)
        .agg(
            F.count("*").cast("double").alias("_n_docs"),
            F.avg("doclen").alias("_avgdl"),
        )
    )

    toks = _tokens_with_len(docs, id_col, text_col)
    # broadcast vocabulary filter BEFORE the token-stream exchange:
    # non-query tokens never shuffle
    matched = toks.join(F.broadcast(vocab), "term", "inner")
    # cached: both the df aggregate and the scoring join consume the
    # matched-pair table — uncached each re-runs the corpus tokenize +
    # explode + vocab join (pairs are (query-vocab × doc) grain, the
    # retrieval working set)
    pairs = matched.groupBy("term", id_col).agg(
        F.count("*").cast("double").alias("tf"),
        F.max("doclen").cast("double").alias("doclen"),
    ).cache()

    # df over the filtered pairs is exact (the term filter keeps every
    # doc of a surviving term) and vocabulary-sized → broadcast back
    df_tbl = pairs.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )

    scored_terms = (
        pairs.join(F.broadcast(df_tbl), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
    )
    idf = F.log(
        (F.col("_n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("_avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scores = (
        scored_terms.select(
            "query_id", F.col(id_col), contrib.alias("_c")
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("_c"), 6).alias("score"))
    )

    order = [F.col("score").desc(), F.col(id_col).asc()]
    if salt_buckets and salt_buckets > 1:
        salted = scores.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), salt_buckets)
        )
        w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
        survivors = (
            salted.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_salt", "_r1")
        )
    else:
        survivors = scores
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )

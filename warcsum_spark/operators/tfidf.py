"""TF-IDF corpus statistics — document frequency, smoothed inverse
document frequency, and top-k characteristic terms per document. The
corpus-analysis primitive behind keyword extraction, near-duplicate
triage ("what makes these docs different"), and quality heuristics
(documents whose top terms are all boilerplate).

Definitions (pinned here because variants abound):

* tf(t, d)  = count of t in d / number of words in d
* df(t)     = number of documents containing t at least once
* idf(t)    = ln((N + 1) / (df + 1)) + 1   (sklearn's smooth_idf)
* score     = tf · idf; top-k per doc by (score desc, term asc)

Plan shape at 100 TB:

1. one posexplode of the normalized word array (token boundaries from
   functions/quality.py::_norm, shared with every other text operator);
2. ``groupBy(doc, term)`` → per-doc term counts — the token-grain
   exchange, map-side combinable (repeated terms collapse before the
   shuffle, and repetitive documents compress the most);
3. df = a count window over the ALREADY doc-distinct (doc, term) rows
   — one exchange on term, and crucially no lineage fork, so the raw
   tokens are read exactly once (see tfidf_scores docstring);
5. top-k per doc via one max-struct aggregation per rank — no global
   sort.

N (corpus size) rides as a literal from one dimension-sized count —
computed lazily via a 1-row cross join so the operator stays a single
plan with no driver action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_counts(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tc, n_words) — per-document term counts over
    whitespace-normalized lowercase words."""
    from warcsum_spark.functions.repetition import _norm_words

    words = _norm_words(F.lower(F.col(text_col)))
    # token array materialized below the Generate — a sibling size(words)
    # would re-run the whole normalize+split per token row (O(len²)/doc);
    # see bm25._tokens_with_len for the full note.
    staged = df.select(doc_col, words.alias("_w")).select(
        doc_col,
        F.explode("_w").alias("term"),
        F.size("_w").alias("n_words"),
    )
    return staged.groupBy(doc_col, "term", "n_words").agg(
        F.count("*").alias("tc")
    )


def tfidf_scores(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf, df_count, idf, score) for every (doc, term).

    df(t) is a COUNT WINDOW over the aggregated (doc, term) rows rather
    than a groupBy+join: a separate aggregation would fork the lineage
    and make Spark tokenize the corpus twice (the two branches prune
    different columns, so even exchange reuse doesn't merge them —
    verified on the executed plan). The window costs one exchange on
    ``term`` but reads the token explode exactly once."""
    tc = term_counts(df, doc_col, text_col)
    n_docs = df.select(F.count("*").alias("_n"))
    w_term = Window.partitionBy("term")
    withdf = tc.crossJoin(F.broadcast(n_docs)).withColumn(
        "df_count", F.count("*").over(w_term)
    )
    idf = F.log((F.col("_n") + 1) / (F.col("df_count") + 1)) + 1
    return withdf.select(
        doc_col,
        "term",
        (F.col("tc") / F.col("n_words")).alias("tf"),
        "df_count",
        idf.alias("idf"),
        (F.col("tc") / F.col("n_words") * idf).alias("score"),
    )


def top_terms(
    df: DataFrame,
    k: int = 5,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, rank, term, score): the k highest-TF-IDF terms per doc,
    rank 1-based, ties broken to the lexicographically smaller term.
    One exchange past tfidf_scores (window per doc); WindowGroupLimit
    (Spark 4) bounds the sort to k rows per group."""
    scored = tfidf_scores(df, doc_col, text_col)
    w = Window.partitionBy(doc_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(doc_col, "rank", "term", "score")
    )

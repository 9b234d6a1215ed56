"""T30 — inverted index build (term → df, cf, posting list), the
search/retrieval-side counterpart of the corpus statistics operators
(tfidf.py computes per-document top terms; this materializes the
term-major view a retrieval or analysis pipeline consumes).

Scale design — the hot-term problem is solved structurally, not by
hoping ``collect_set`` fits:

* **Statistics pass** (df = documents containing the term, cf = total
  occurrences) is one exchange keyed on the term with map-side partial
  aggregation — stopwords collapse to one row per partition before the
  shuffle, so the exchange carries at most |vocab| × partitions rows.
* **Posting lists only for terms with df ≤ max_postings.** A full
  posting list for a stopword at corpus scale is billions of entries in
  one aggregation buffer — the classic single-key OOM. Real systems
  shard or skip those; here the bounded-df join FILTERS the token
  stream before any list is collected, so no aggregation buffer can
  exceed ``max_postings`` entries. Hot terms keep exact df/cf and a
  null posting list (callers that need hot-term postings shard by
  (term, doc_id range) explicitly).
* Tokenization is the battery-wide shared projection
  (functions/quality._norm): one definition of a token across quality,
  repetition, TF-IDF, and this index.

Reference anchor: no counterpart in the reference engine (its unit is
the WARC record, warcsum.c:881–1011); §2.12 training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from warcsum_spark.functions.quality import _norm

    norm = _norm(F.col(text_col))
    words = F.when(
        norm == "", F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))
    return docs.select(F.col(id_col), F.explode(words).alias("term"))


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int | None = None,
) -> DataFrame:
    """(term, df, cf, postings): df = distinct documents, cf = total
    occurrences, postings = ascending distinct doc ids — null for terms
    with df > ``max_postings`` (exact stats are still emitted for them;
    see module docstring for why hot lists are structurally skipped)."""
    toks = _tokens(docs, id_col, text_col)
    stats = toks.groupBy("term").agg(
        F.count_distinct(id_col).alias("df"), F.count("*").alias("cf")
    )
    pairs = toks.distinct()
    if max_postings is not None:
        eligible = stats.filter(F.col("df") <= max_postings).select("term")
        pairs = pairs.join(eligible, "term", "left_semi")
    postings = pairs.groupBy("term").agg(
        F.sort_array(F.collect_set(id_col)).alias("postings")
    )
    return stats.join(postings, "term", "left").select(
        "term", "df", "cf", "postings"
    )

"""T30 — inverted index build (term → df, cf, posting list), the
search/retrieval-side counterpart of the corpus statistics operators
(tfidf.py computes per-document top terms; this materializes the
term-major view a retrieval or analysis pipeline consumes).

Scale design — the hot-term problem is solved structurally, not by
hoping ``collect_set`` fits:

* **One token-stream exchange, period.** The corpus is exploded ONCE
  and aggregated to the (term, doc, tc) grain — keyed on (term, doc)
  with map-side partial aggregation, so within-document repeats
  collapse before the shuffle. Every later step (df/cf statistics,
  eligibility, posting collection) runs over that pair table, which is
  distinct-pairs-sized, not token-stream-sized. The earlier draft
  shuffled the token stream twice (a stats agg AND a no-combine
  ``.distinct()`` for pairs) and re-exploded the corpus for each
  lineage branch — measured as the operator's scale bottleneck (suite
  ×30 amplification: 3.4× throughput vs the suite median 13×).
* **df/cf fall out of the pair table**: df = rows per term, cf =
  sum(tc) — one dimension-sized exchange on term.
* **Posting lists only for terms with df ≤ max_postings.** A full
  posting list for a stopword at corpus scale is billions of entries in
  one aggregation buffer — the classic single-key OOM. Real systems
  shard or skip those; here df rides a window over the pair table and
  ineligible doc ids are nulled INSIDE ``collect_list`` (which skips
  nulls), so a hot term's aggregation buffer stays empty — no list can
  exceed ``max_postings`` entries, with zero joins and a single
  lineage (the pair table is computed once; the window and the final
  aggregation share the term partitioning, so no exchange between
  them). Hot terms keep exact df/cf and a null posting list (callers
  that need hot-term postings shard by (term, doc_id range)
  explicitly).
* Tokenization is the battery-wide shared projection
  (functions/quality._norm): one definition of a token across quality,
  repetition, TF-IDF, and this index.

Reference anchor: no counterpart in the reference engine (its unit is
the WARC record, warcsum.c:881–1011); §2.12 training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from warcsum_spark.functions.quality import _norm

    norm = _norm(F.col(text_col))
    words = F.when(
        norm == "", F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))
    return docs.select(F.col(id_col), F.explode(words).alias("term"))


def term_doc_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, id, _tc) — the aggregated token stream; the ONLY
    token-stream exchange of the index build, exposed so callers that
    need the SAME corpus indexed under several id assignments (T93)
    tokenize once and re-key this slim table."""
    toks = _tokens(docs, id_col, text_col)
    # the ONLY token-stream exchange: (term, doc) with map-side combine
    return toks.groupBy("term", id_col).agg(F.count("*").alias("_tc"))


def index_from_pairs(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """``build_inverted_index`` from an existing term_doc_pairs table."""
    elem = F.col(id_col)
    if max_postings is not None:
        w = Window.partitionBy("term")
        pairs = pairs.withColumn("_wdf", F.count("*").over(w))
        # null elements are skipped by collect_list: hot terms buffer nothing
        elem = F.when(F.col("_wdf") <= max_postings, F.col(id_col))
    agg = pairs.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("_tc").alias("cf"),
        F.sort_array(F.collect_list(elem)).alias("_p"),
    )
    postings = F.col("_p")
    if max_postings is not None:
        postings = F.when(F.col("df") <= max_postings, F.col("_p"))
    return agg.select("term", "df", "cf", postings.alias("postings"))


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
    return index_from_pairs(
        term_doc_pairs(docs, id_col, text_col), id_col, max_postings
    )

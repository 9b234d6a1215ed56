"""Paragraph-level exact deduplication — the RefinedWeb / CCNet-style
pass that removes REPEATED PARAGRAPHS ACROSS the whole corpus (boilerplate
headers, cookie banners, license blurbs) while keeping each document's
first occurrence, then reassembles documents from their surviving
paragraphs.

Spark-first shape (two exchanges, both unavoidable and both slim):

1. ``posexplode`` paragraphs → project ``(doc, idx, md5(para))`` — the
   128-bit digest, not the paragraph text, is what the wide shuffle
   carries (same trick as the digest-manifest pipeline,
   warcsum.c:212-260 semantics: content identity travels as a hash).
   The paragraph text rides along only into the window stage below
   because reassembly needs it back; callers that only want the keep
   DECISION can drop it and shuffle pure 24-byte rows.
2. first-occurrence per digest = ``row_number`` over
   ``(phash | order by doc, idx)`` — one hash exchange keyed on the
   digest; ties are deterministic (document id, then position).
3. reassembly = ``collect_list(struct(idx, para))`` per doc →
   ``array_sort`` → join with the paragraph separator — one exchange
   keyed on doc id. Documents whose every paragraph was dropped stay in
   the output with empty text (left join from the distinct doc set).

At 100 TB the digest exchange is the cost center and it is ~40 bytes/
paragraph + the paragraph payload for the rebuild path; skew (a
boilerplate paragraph repeated 10^9×) lands on one digest partition but
only as row_number input, which the sort handles streaming — no
cross-partition reduce state.

Unit definition matches functions/repetition.py: paragraphs split on
``\\n{2,}``, whitespace-only paragraphs dropped (they are separator
artifacts, not content — and keeping them would make every blank
paragraph a corpus-wide "duplicate").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.functions.repetition import PARA_SPLIT_RE, _NONBLANK_RE

PARA_JOIN = "\n\n"


def explode_paragraphs(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, para_idx, para, phash) — one row per non-blank paragraph,
    ``para_idx`` the 0-based position among the doc's kept paragraphs."""
    paras = F.filter(
        F.split(F.col(text_col), PARA_SPLIT_RE), lambda x: x.rlike(_NONBLANK_RE)
    )
    return (
        df.select(doc_col, F.posexplode(paras).alias("para_idx", "para"))
        .withColumn("phash", F.md5("para"))
    )


def dedup_paragraphs(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide paragraph dedup: keep each distinct paragraph's first
    occurrence (by ``(doc, position)``), rebuild every document from its
    survivors. Returns ``(doc_col, text_col, n_paras, n_kept)`` — a doc
    whose paragraphs were all dropped keeps its row with empty text, so
    the operator never changes the corpus row count."""
    exploded = explode_paragraphs(df, doc_col, text_col)
    w = Window.partitionBy("phash").orderBy(doc_col, "para_idx")
    kept = exploded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    rebuilt = kept.groupBy(doc_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ),
            PARA_JOIN,
        ).alias(text_col),
        F.count("*").alias("n_kept"),
    )
    totals = exploded.groupBy(doc_col).agg(F.count("*").alias("n_paras"))
    base = df.select(doc_col)
    return (
        base.join(totals, doc_col, "left")
        .join(rebuilt, doc_col, "left")
        .select(
            doc_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )

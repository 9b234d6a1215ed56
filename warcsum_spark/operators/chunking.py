"""Context-window document chunking — split documents into fixed-size
token windows with overlap (the "prepare docs for a C-token context"
step between filtering and shard packing; overlap preserves cross-chunk
context for training and retrieval indexing).

Semantics: words from the shared whitespace-normalized projection
(functions/quality.py::_norm); chunk i covers words
``[i·(C−O), i·(C−O)+C)``; the number of chunks is
``max(1, ceil((n_words − O) / (C − O)))`` so the final window may be
short but every word is covered and consecutive chunks share exactly O
words. Empty documents yield no chunks (nothing to train on — and
`dedup_paragraphs` set the precedent that emptiness is representable by
absence here, row preservation by the caller's left join).

Plan shape: stage the word array once (the repetition-battery lesson:
inline arrays inside higher-order functions re-evaluate per element),
build all chunk texts as one array expression, ``posexplode`` — a pure
map-side fan-out, no shuffle at any size. At 100 TB the output is
~(1 + O/(C−O))× the input tokens; the overlap factor is the only
amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_col, chunk_id, n_chunk_words, chunk_text) — 0-based
    chunk_id in document order."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    from warcsum_spark.functions.repetition import _norm_words

    c, o = chunk_tokens, overlap
    step = c - o
    staged = df.withColumn("_ck_words", _norm_words(F.col(text_col)))
    n = F.size("_ck_words")
    # integer ceil((n - o) / step), clamped to >= 1 for any non-empty doc
    k = F.greatest(F.floor((n - o + step - 1) / F.lit(step)), F.lit(1))
    chunks = F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_ck_words"), i * step + 1, c)
            ),
        )
    )
    out = staged.select(
        doc_col,
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    n_chunk = F.least(F.lit(c), F.col("_n") - F.col("chunk_id") * step)
    return out.select(
        doc_col,
        "chunk_id",
        n_chunk.cast("long").alias("n_chunk_words"),
        "chunk_text",
    )

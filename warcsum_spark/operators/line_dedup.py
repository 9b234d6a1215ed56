"""T81 — in-document duplicate-line removal (the RefinedWeb / FineWeb
line-wise correction pass: web pages repeat their own lines — share
bars, cookie prompts, "read more" stubs, templated list rows — and the
fix is to keep the FIRST occurrence of each line within the document
and drop the repeats, rewriting the text).

Positioning vs. the neighbouring passes: T15 (functions/repetition.py)
*measures* within-doc duplicate-line fractions as Gopher quality
signals but never rewrites; T29 (operators/boilerplate.py) removes
lines by cross-document frequency within a host; T49
(operators/span_dedup.py) removes corpus-duplicated token spans. This
pass is the remaining cell of that matrix — within-document, rewriting
— and is deliberately the cheapest of the four.

Spark-first plan: **zero exchanges, zero UDFs**. The keep-decision for
every line is a row-local array expression — line *i* survives iff it
is whitespace-only (blank structure is layout, not repetition; also the
degenerate hot key) or its first occurrence index in the document's own
line array is *i* — evaluated with SQL higher-order functions
(``filter(lines, (l, i) -> …)`` + ``array_position``) inside
whole-stage codegen. ``array_position`` makes the per-doc cost
O(L·distinct-L) in the worst case, but L is lines-per-document (a few
hundred), not a corpus dimension: the operator is embarrassingly
map-parallel, streams through a 10^10-row corpus with no shuffle, and
composes into any plan without a stage break. The document text never
leaves its partition.

Reference anchor: the reference dedups whole payloads across the
archive (warccollres.c); sub-document self-repetition is §2.12
training-data surface beyond it (Penedo et al. 2023, "The RefinedWeb
Dataset", §3.3 line-wise filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.repetition import _NONBLANK_RE

def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, carry..., n_lines, n_dropped, clean_text): drop every
    non-blank line that already occurred earlier in the SAME document
    (exact string match); first occurrences and whitespace-only lines
    keep their original order and position."""
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    # filter() passes (element, 0-based index); array_position gives the
    # 1-based FIRST index of the element in the doc's own line array.
    kept = F.filter(
        "_lines",
        lambda l, i: (~l.rlike(_NONBLANK_RE))
        | (F.array_position(F.col("_lines"), l) == i + 1),
    )
    return staged.select(
        id_col,
        *carry_cols,
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size(kept)).cast("long").alias("n_dropped"),
        F.array_join(kept, "\n").alias("clean_text"),
    )

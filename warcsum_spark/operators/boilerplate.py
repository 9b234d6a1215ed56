"""T29 — host/source-scoped boilerplate line removal (the CCNet-style
template-stripping pass every web-corpus pipeline runs: navigation bars,
cookie banners, copyright footers repeat on nearly every page of a site;
dropping lines by WITHIN-GROUP document frequency removes them without
touching content that merely repeats across the web).

Spark-first plan, two exchanges total and no per-document reassembly
shuffle:

1. **Document frequency** — the (group, line, doc) grain is reached
   MAP-SIDE: each document's line array is ``array_distinct``-ed
   before the explode (a line repeated within one doc counts once, by
   definition of df), so the only corpus-sized exchange is the
   (group, line) count aggregation itself — with map-side partial
   aggregation, under which the template lines this pass targets are
   exactly the ones that collapse hardest (one row per partition
   instead of one per document). The earlier draft reached the same
   grain with a ``.distinct()`` — a second full-stream shuffle carrying
   every line's text, measured as the operator's scale bottleneck
   (suite ×30 amplification: 2.9× throughput vs the suite median 13×).
2. **Boilerplate set per group** — lines whose df/group-docs ratio
   clears ``min_df_frac`` in groups with at least ``min_docs``
   documents are collected into ONE array per group. The set is
   bounded by construction: a line needs to appear in ≥ frac of the
   group's documents, so a group of D docs with L lines/doc has at
   most L/frac qualifying lines — independent of D.
3. **Filter in place** — the per-group array joins back on the group
   key (hash join on a dimension-sized side; broadcast when small) and
   the document's own line array is filtered with a JVM higher-order
   function. The document text never leaves its partition: cleaning is
   map-side, keyed joins only move the (group, lines[]) dimension.

Reference anchor: the reference engine dedups whole payloads
(warccollres.c); sub-document template removal is part of the §2.12
training-data surface the build brief mandates beyond it. Grouping
defaults to the ``source`` column (stand-in for registrable domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.repetition import _NONBLANK_RE


def remove_boilerplate(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df_frac: float = 0.5,
    min_docs: int = 5,
) -> DataFrame:
    """(id, group, n_lines, n_removed, clean_text): drop every line that
    appears in ≥ ``min_df_frac`` of the group's documents (exact string
    match, whitespace-only lines never counted), in groups with at
    least ``min_docs`` documents. Line order is preserved; documents in
    smaller groups pass through untouched."""
    lines = F.split(F.col(text_col), "\n")
    staged = docs.select(
        F.col(id_col), F.col(group_col), lines.alias("_lines")
    )

    group_docs = staged.groupBy(group_col).agg(
        F.count("*").alias("_n_docs")
    )
    # (group, line, doc) grain map-side: within-doc repeats collapse in
    # the array, blank lines drop before the explode — ONE exchange
    doc_lines = F.array_distinct(
        F.filter("_lines", lambda l: l.rlike(_NONBLANK_RE))
    )
    df_counts = (
        staged.select(group_col, F.explode(doc_lines).alias("line"))
        .groupBy(group_col, "line")
        .agg(F.count("*").alias("_df"))
    )
    bl_sets = (
        df_counts.join(group_docs, group_col)
        .filter(
            (F.col("_n_docs") >= min_docs)
            & (F.col("_df") >= F.col("_n_docs") * F.lit(float(min_df_frac)))
        )
        .groupBy(group_col)
        # deterministic array: membership tests don't need order, but a
        # stable output makes the frame itself comparable/testable
        .agg(F.sort_array(F.collect_set("line")).alias("_bl"))
    )
    out = staged.join(bl_sets, group_col, "left")
    bl = F.coalesce(F.col("_bl"), F.array().cast("array<string>"))
    kept = F.filter(F.col("_lines"), lambda l: ~F.array_contains(bl, l))
    return out.select(
        id_col,
        group_col,
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, "\n").alias("clean_text"),
    )

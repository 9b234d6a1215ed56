"""T58 — taxonomy keyword tagging: score every document against a
topic→keyword dictionary (single tokens or multi-word phrases) and emit
per-topic hit counts. This is the classifier tier below model scoring
(operators/classify.py): curated keyword taxonomies (news/commerce/
adult/code/...) are how web-scale pipelines route documents to domain
mixes, apply category-specific quality bars, and build weak labels for
training the very fastText models T24 stubs — FineWeb/CCNet-style
pipelines run exactly this before any learned classifier exists.

Plan shape at 100 TB: ZERO exchanges for the long-form output. The
dictionary is compiled INTO the projection as replace-arithmetic
expressions (the functions/text.py trick): normalized text with doubled
spaces makes every token occurrence carry its own delimiters, so
``(len(s) - len(replace(s, ' kw '))) / len(' kw ')`` counts occurrences
EXACTLY — token and phrase keywords uniformly, no regex, no explode, no
token-stream join, no Python. Per row the cost is one linear pass per
keyword; the taxonomy is plan-side data (fine to hundreds of keywords —
for dictionaries beyond that, pre-filter with one regexp_count gate or
fall back to an explode + broadcast-join tier, which trades a doc-keyed
exchange for O(1) expression width).

Engine-portability: pure integer arithmetic on replace/length — the
DuckDB twin is the same expressions generated from the same dictionary
(``tagging_oracle_sql``), exact by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    """lowercase, non-alphanumeric → space, collapse runs, then DOUBLE
    every space and pad — each token occurrence gets private delimiters
    so phrase matches can never overlap-collide."""
    s = F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")
    s = F.regexp_replace(s, r"^ +| +$", "")
    return F.concat(F.lit(" "), F.regexp_replace(s, " ", "  "), F.lit(" "))


def _norm_kw(kw: str) -> str:
    """The keyword under the same normalization: lowercased, internal
    whitespace doubled, space-padded."""
    toks = kw.lower().split()
    return " " + "  ".join(toks) + " "


def _count(norm: Column, kw: str) -> Column:
    pat = _norm_kw(kw)
    return (
        (F.length(norm) - F.length(F.replace(norm, F.lit(pat), F.lit(""))))
        / len(pat)
    ).cast("long")


def tag_topics(
    docs: DataFrame,
    taxonomy: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, topic, hits) for every document × topic with at least
    ``min_hits`` keyword occurrences. Map-only: the taxonomy compiles
    into the projection; rows never shuffle.

    The normalization (3 regex passes over the full text) is
    materialized as its own projection ONCE and every keyword counter
    references that column — inlining ``norm`` per keyword would rely
    on codegen subexpression elimination to avoid N_keywords × 3 regex
    passes per document, and the keyword counters sit inside an array
    constructor where CSE does not reach (measured ~5× on the bench)."""
    norm = F.col("__norm")
    pairs = [
        F.struct(
            F.lit(topic).alias("topic"),
            sum(
                (_count(norm, kw) for kw in kws), F.lit(0).cast("long")
            ).alias("hits"),
        )
        for topic, kws in sorted(taxonomy.items())
    ]
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), _norm(F.col(text_col)).alias("__norm")
        )
        .select("doc_id", F.explode(F.array(*pairs)).alias("t"))
        .select("doc_id", F.col("t.topic").alias("topic"), F.col("t.hits").alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def top_topic(tags: DataFrame) -> DataFrame:
    """(doc_id, topic, hits) — each document's strongest topic (ties →
    lexicographically first topic). One doc-keyed exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("topic").asc())
    return (
        tags.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


def tagging_oracle_sql(
    taxonomy: dict[str, list[str]],
    min_hits: int = 1,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The same replace-arithmetic compiled to DuckDB SQL from the same
    dictionary — exact by construction (integer counts, no floats)."""
    norm = (
        f"' ' || replace(trim(regexp_replace(lower({text_col}), "
        f"'[^a-z0-9]+', ' ', 'g')), ' ', '  ') || ' '"
    )
    topic_rows = []
    for topic, kws in sorted(taxonomy.items()):
        terms = " + ".join(
            f"CAST((length(n) - length(replace(n, '{_norm_kw(kw)}', ''))) "
            f"/ {len(_norm_kw(kw))} AS BIGINT)"
            for kw in kws
        )
        topic_rows.append(f"SELECT {id_col} AS doc_id, '{topic}' AS topic, {terms} AS hits FROM nrm")
    body = "\nUNION ALL\n".join(topic_rows)
    return (
        f"WITH nrm AS (SELECT {id_col}, {norm} AS n FROM {docs_table})\n"
        f"SELECT doc_id, topic, hits FROM ({body}) WHERE hits >= {min_hits}"
    )

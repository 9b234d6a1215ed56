"""Benchmark decontamination for training corpora: flag (or drop)
training documents that share k-word shingles with an evaluation/
benchmark set — the standard n-gram-overlap decontamination used by
large-scale LM data pipelines (GPT-3 appendix C / Gopher §A1.2 style).

Scale shape: the benchmark side is small (eval sets are thousands of
docs, the corpus is billions) → its distinct shingle set is BROADCAST;
the corpus side's only wide operation is the per-doc distinct inside
``word_shingles``. No corpus-vs-corpus join exists here — contamination
is corpus×benchmark by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import word_shingles


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_common: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_common) — corpus docs sharing ≥ ``min_common`` DISTINCT
    k-word shingles with the benchmark set, with the count.

    The benchmark shingle set is deduplicated then broadcast: the join
    adds no shuffle beyond the corpus-side per-doc distinct, and the
    count per doc is a map-side-combinable groupBy on doc_id."""
    corpus_sh = word_shingles(corpus, k, id_col, text_col)
    bench_sh = (
        word_shingles(benchmark, k, id_col, text_col)
        .select("shingle")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_common: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus minus contaminated docs (original columns). Anti-join on
    the flagged id set — no corpus row ever carries shingle payloads
    through a shuffle."""
    flagged = contamination_overlap(
        corpus, benchmark, k, min_common, id_col, text_col
    ).select(F.col("doc_id").alias(id_col))
    return corpus.join(flagged, id_col, "left_anti")

"""T83 — corpus collocation mining by pointwise mutual information
(Church & Hanks 1990, "Word Association Norms, Mutual Information, and
Lexicography"): the adjacent word pairs whose co-occurrence most
exceeds chance. The classic corpus-linguistics primitive behind
phrase/entity discovery, tokenizer-merge candidates (the statistical
cousin of T51's BPE frequency argmax), and boilerplate phrase triage.

Definitions (pinned — variants abound):

* tokens: whitespace-normalized lowercase words (token boundaries from
  functions/quality.py::_norm, shared with TF-IDF/BM25/top-ngrams);
* c_xy = corpus count of the ADJACENT pair (x, y) within a document
  (pairs never span documents); c_x = corpus unigram count;
* pmi(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) = c_xy / n_bigrams
  and p(x) = c_x / n_tokens — evaluated as
  ``ln(((c_xy·n_tok)·n_tok) / ((n_bi·c_x)·c_y))`` with that exact
  association so Spark and the DuckDB oracle produce bit-identical
  doubles;
* report pairs with c_xy ≥ min_count (PMI is noise below a support
  floor — Church & Hanks use 5), top-k by (pmi desc, w1, w2).

Plan shape at 100 TB:

1. ONE pass over the corpus: per-document word arrays → a row-local
   ``transform`` builds (w_i, w_{i+1}) structs (``F.get`` — the
   null-past-the-end accessor, ANSI-safe — marks each document's final
   token with w2 = NULL) → one explode → ``groupBy(w1, w2)`` — the
   single corpus-grain exchange, map-side combinable (natural-language
   pair frequencies are Zipfian, so partial aggregation collapses the
   hot pairs before the shuffle);
2. the pair-count table is vocab²-bounded (in practice ~unique-bigrams
   sized, ≪ corpus) and feeds THREE consumers — unigram counts
   (sum over w1: every token is w1 of exactly one struct), bigram
   counts (w2 non-null), and the two corpus totals — so it is
   ``localCheckpoint``ed once (lazy) to cut the lineage fork that
   would otherwise re-read and re-explode the corpus per consumer
   (the hits.py/lpa.py precedent);
3. everything after is vocab-grain: two hash joins of bigrams against
   unigram counts, a one-row broadcast cross join for the totals
   (the tfidf.py normalizer pattern), and a distributed top-k
   (TakeOrderedAndProject — no single-partition global sort).

Reference anchor: the reference (warcsum.c) has no corpus-statistics
surface; §2.12 training-data frontier (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_counts(
    df: DataFrame, text_col: str = "text", checkpoint: bool = True
) -> DataFrame:
    """(w1, w2, c): corpus counts of adjacent lowercase word pairs;
    rows with w2 NULL carry each document's final token (so unigram
    counts are recoverable from this one table: c_x = Σ c over w1).
    Lazily localCheckpointed by default — the table is unique-bigram
    sized and callers always branch over it."""
    from warcsum_spark.functions.repetition import _norm_words

    staged = df.select(
        _norm_words(F.lower(F.col(text_col))).alias("_words")
    )
    pairs = F.when(
        F.size("_words") > 0,
        F.transform(
            F.sequence(F.lit(0), F.size("_words") - 1),
            lambda i: F.struct(
                F.get("_words", i).alias("w1"),
                F.get("_words", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    exploded = staged.select(F.explode(pairs).alias("p")).select(
        "p.w1", "p.w2"
    )
    pc = exploded.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    return pc.localCheckpoint(eager=False) if checkpoint else pc


def pmi_collocations(
    df: DataFrame,
    k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(rank, w1, w2, c_xy, c_x, c_y, pmi): the k adjacent word pairs
    with the highest pointwise mutual information among pairs seen at
    least ``min_count`` times; rank 1-based, ties broken to the
    lexicographically smaller (w1, w2); pmi rounded to 6 places."""
    pc = pair_counts(df, text_col)
    uni = pc.groupBy("w1").agg(F.sum("c").alias("c_x"))
    bi = pc.filter(F.col("w2").isNotNull()).withColumnRenamed("c", "c_xy")
    totals = pc.agg(
        F.sum("c").alias("n_tok"),
        F.sum(F.when(F.col("w2").isNotNull(), F.col("c"))).alias("n_bi"),
    )
    joined = (
        bi.join(uni, "w1")
        .join(
            uni.select(
                F.col("w1").alias("w2"), F.col("c_x").alias("c_y")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
    )
    # association pinned — see module docstring (oracle bit-parity)
    pmi = F.log(
        (F.col("c_xy").cast("double") * F.col("n_tok")) * F.col("n_tok")
        / ((F.col("n_bi").cast("double") * F.col("c_x")) * F.col("c_y"))
    )
    scored = (
        joined.filter(F.col("c_xy") >= min_count)
        .select("w1", "w2", "c_xy", "c_x", "c_y", pmi.alias("_pmi"))
        .orderBy(F.col("_pmi").desc(), "w1", "w2")
        .limit(k)
    )
    w = Window.orderBy(F.col("_pmi").desc(), "w1", "w2")
    return scored.select(
        F.row_number().over(w).alias("rank"),
        "w1",
        "w2",
        "c_xy",
        "c_x",
        "c_y",
        F.round("_pmi", 6).alias("pmi"),
    )

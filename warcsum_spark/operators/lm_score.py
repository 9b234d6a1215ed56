"""T39 — n-gram language-model perplexity scoring (the CCNet recipe:
Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", LREC 2020 — score web documents by the perplexity
of a language model trained on a trusted reference corpus; low
perplexity ≈ fluent prose, high ≈ gibberish/boilerplate/wrong
language). CCNet uses a pretrained KenLM binary; this operator trains
the LM *inside the engine* from a reference DataFrame, so the whole
path is one lazy Spark plan with a DuckDB-recomputable oracle and no
external model artifact.

Model (pinned exactly — variants abound):

* tokens: the corpus-wide normalized lowercase words
  (functions/quality.py::_norm boundaries, shared with every text
  operator);
* vocab: the ``vocab_size`` most frequent reference terms
  (count DESC, term ASC — deterministic ties); everything else maps
  to ``<unk>``;
* bigram model with add-alpha smoothing over the clipped vocab:
  ``P(w|v) = (C(v,w) + alpha) / (C(v) + alpha*(vocab_size+1))``
  where counts come from the vocab-mapped reference stream;
* per-doc: ``avg_logprob`` = mean over the doc's bigrams of
  ``ln P(w|v)``, ``perplexity = exp(-avg_logprob)``. Docs with < 2
  tokens score NULL (nothing observed).

Float pinning: aggregates are rounded to 6 dp at the OUTPUT only —
never per-term. Per-term rounding looks safer but is a trap: it makes
the per-doc sum an exact 6-digit decimal, so ``sum/n`` lands exactly ON
round-half boundaries for many docs (e.g. -0.042734/92 = -0.0004645)
and Spark/DuckDB half-handling then diverges systematically. With raw
doubles the engines differ only by libm-ulp + sum-order noise (~1e-13),
which is uniformly far from the 1e-6 grid's boundaries.

Plan shape at 100 TB (every exchange slim-keyed):

1. vocab: term-count agg (map-side combine) → TakeOrdered top-V — no
   global sort; V rows broadcast;
2. bigram extraction is MAP-ONLY: ``arrays_zip(slice, slice)`` on the
   word array — no position self-join;
3. vocab mapping: two broadcast hash joins (V rows);
4. model: one (v, w) agg over the reference stream; context totals
   C(v) fall out of a window over the AGGREGATED model table (no
   second corpus pass);
5. scoring: the model is ≤ (V+1)² rows BY CONSTRUCTION (clipped
   vocab), so for practical V it broadcasts and scoring is fully
   map-side (auto below ``broadcast_model_max_vocab``; forced either
   way via ``broadcast_model``). Past that, a sort-merge join on the
   slim (v, w) keys; unseen pairs coalesce to 0 either way. The
   context join is always broadcast (≤ V+1 rows); one doc-keyed agg
   closes the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

UNK = "<unk>"


def _words(text_col: str) -> Column:
    from warcsum_spark.functions.repetition import _norm_words

    return _norm_words(F.lower(F.col(text_col)))


def _bigram_stream(
    df: DataFrame, id_cols: list[str], text_col: str
) -> DataFrame:
    """(id_cols..., v, w) — one row per consecutive word pair, map-only."""
    w = _words(text_col)
    pairs = F.when(
        F.size(w) >= 2,
        F.arrays_zip(
            F.expr(f"slice({'_lm_w'}, 1, size({'_lm_w'}) - 1)"),
            F.expr(f"slice({'_lm_w'}, 2, size({'_lm_w'}) - 1)"),
        ),
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))
    staged = df.withColumn("_lm_w", w).select(
        *id_cols, F.explode(pairs).alias("_bg")
    )
    return staged.select(
        *id_cols,
        F.col("_bg.0").alias("v"),
        F.col("_bg.1").alias("w"),
    )


def lm_vocab(
    reference: DataFrame, text_col: str = "text", vocab_size: int = 10_000
) -> DataFrame:
    """(term) — the ``vocab_size`` most frequent reference terms,
    ties broken lexicographically. TakeOrdered, never a global sort."""
    return (
        reference.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term")
    )


def _map_vocab(stream: DataFrame, vocab: DataFrame, col: str) -> DataFrame:
    hit = vocab.select(F.col("term").alias(col), F.lit(True).alias("_in"))
    # coalesce with a literal, not when/otherwise: the output column is
    # then provably NON-NULLABLE, so the isnotnull(v)/isnotnull(w)
    # predicates the downstream model join pushes into its build side
    # constant-fold away instead of surviving as filters that make the
    # model/scoring subtrees canonically different (which would defeat
    # the fused path's exchange reuse and re-run the extraction)
    mapped = F.coalesce(
        F.when(F.col("_in").isNotNull(), F.col(col)), F.lit(UNK)
    )
    return (
        stream.join(F.broadcast(hit), col, "left")
        .withColumn(col, mapped)
        .drop("_in")
    )


def train_bigram_lm(
    reference: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(v, w, c_vw, c_v) — vocab-mapped bigram counts plus context
    totals (a window over the aggregated table, not a second pass)."""
    bg = _bigram_stream(reference, [], text_col)
    bg = _map_vocab(_map_vocab(bg, vocab, "v"), vocab, "w")
    model = bg.groupBy("v", "w").agg(F.count("*").alias("c_vw"))
    return model.withColumn(
        "c_v", F.sum("c_vw").over(Window.partitionBy("v"))
    )


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame | None = None,
    doc_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 10_000,
    alpha: float = 0.1,
    broadcast_model: bool | None = None,
    broadcast_model_max_vocab: int = 4096,
    reference_pred: Column | None = None,
) -> DataFrame:
    """(doc_col, n_bigrams, avg_logprob, perplexity) for every doc.
    ``reference`` defaults to ``docs`` itself (self-perplexity — useful
    for outlier mining); CCNet-style filtering passes a trusted corpus.

    When the reference is a row-subset of ``docs`` itself, pass its
    predicate as ``reference_pred`` (e.g. ``F.col("lang") == "en"``)
    instead of a filtered frame: the fused path then extracts + vocab-
    maps the corpus bigrams ONCE, aggregates to per-(doc, v, w) counts,
    and derives the model from that same aggregate with a conditional
    sum — a ``.filter(_is_ref)`` would be pushed below the aggregate by
    Catalyst and split the subtree back into two extraction passes, so
    reference membership is folded into the aggregate instead and both
    consumers share one Exchange (ReuseExchange, same shape as
    operators/dsir.py). ``reference_pred`` and ``reference`` are
    mutually exclusive.
    """
    if reference_pred is not None and reference is not None:
        raise ValueError("pass reference or reference_pred, not both")
    if reference is not None:
        # general two-corpus path: the reference is a different frame,
        # nothing to share with the scoring stream
        vocab = lm_vocab(reference, text_col, vocab_size)
        model = train_bigram_lm(reference, vocab, text_col)
        bg = _bigram_stream(docs, [doc_col], text_col)
        bg = _map_vocab(_map_vocab(bg, vocab, "v"), vocab, "w")
        scored = bg.groupBy(doc_col, "v", "w").agg(
            F.count("*").alias("_n")
        )
    else:
        pred = F.lit(True) if reference_pred is None else reference_pred
        vocab = lm_vocab(docs.filter(pred), text_col, vocab_size)
        # null-id docs can never be scored (the spine left join can't
        # match them); the explicit filter also keeps the two consumers
        # of the aggregate canonically identical once the spine join
        # pushes its own isnotnull — see operators/dsir.py
        keyed = docs.filter(F.col(doc_col).isNotNull()).withColumn(
            "_is_ref", F.coalesce(pred.cast("boolean"), F.lit(False))
        )
        bg = _bigram_stream(keyed, [doc_col, "_is_ref"], text_col)
        bg = _map_vocab(_map_vocab(bg, vocab, "v"), vocab, "w")
        g = bg.groupBy(doc_col, "_is_ref", "v", "w").agg(
            F.count("*").alias("_n")
        )
        # conditional sum, NOT g.filter("_is_ref"): a filter on the
        # grouping column would be pushed below the aggregate and
        # defeat the exchange reuse
        model = (
            g.groupBy("v", "w")
            .agg(
                F.sum(
                    F.when(F.col("_is_ref"), F.col("_n")).otherwise(F.lit(0))
                ).alias("c_vw")
            )
            .filter(F.col("c_vw") > 0)
        )
        model = model.withColumn(
            "c_v", F.sum("c_vw").over(Window.partitionBy("v"))
        )
        scored = g.drop("_is_ref")

    contexts = model.select("v", "c_v").distinct()
    mdl = model.select("v", "w", "c_vw")
    if broadcast_model or (
        broadcast_model is None and vocab_size <= broadcast_model_max_vocab
    ):
        mdl = F.broadcast(mdl)
    denom_add = F.lit(alpha * (vocab_size + 1))
    lp = F.log(
        (F.coalesce(F.col("c_vw"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c_v"), F.lit(0)) + denom_add)
    )
    scored = (
        scored.join(mdl, ["v", "w"], "left")
        .join(F.broadcast(contexts), "v", "left")
        .select(doc_col, F.col("_n"), lp.alias("_lp"))
    )
    agg = scored.groupBy(doc_col).agg(
        F.sum("_n").alias("n_bigrams"),
        F.round(
            F.sum(F.col("_lp") * F.col("_n")) / F.sum("_n"), 6
        ).alias("avg_logprob"),
    )
    spine = docs.select(doc_col)
    return (
        spine.join(agg, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("perplexity"),
        )
    )


def moore_lewis(
    docs: DataFrame,
    in_domain_pred: Column,
    doc_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 10_000,
    alpha: float = 0.1,
    threshold: float = 0.0,
) -> DataFrame:
    """T112 — Moore–Lewis cross-entropy data selection (Moore & Lewis,
    ACL 2010, "Intelligent selection of language model training data"
    — THE classic recipe, still the baseline every data-selection
    paper compares against and the ancestor of CCNet's perplexity
    buckets (T78) and DSIR (T40)): score each document by

        ml_score = H_in(d) - H_gen(d)
                 = avg_logprob_gen(d) - avg_logprob_in(d)

    the difference between its cross-entropy under an IN-DOMAIN LM
    and under a GENERAL-corpus LM; low scores are documents that look
    like the target domain *specifically* (not merely fluent — the
    general model cancels generic fluency, the paper's whole point).
    ``selected`` = rounded score <= ``threshold`` (paper convention).

    Both LMs are T39's pinned add-alpha bigram model and SHARE one
    vocabulary, trained on the in-domain slice (Moore & Lewis §3 use a
    common vocab so OOV mass cancels between the models). Pinning
    discipline is T39's: raw doubles through the sums, round-6 at the
    output only; ``ml_score`` is rounded from the RAW average
    difference (not from the two displayed round-6 columns), and
    ``selected`` tests the ROUNDED score so the flag is engine-exact.
    Docs with < 2 tokens score NULL and are never selected.

    Plan shape at 100 TB — the dsir.py/fused-T39 discipline: the
    corpus bigram stream is extracted and vocab-mapped ONCE; one
    (doc, is_ref, v, w) aggregate feeds BOTH models as conditional
    sums (in-domain = sum where is_ref, general = sum of all) and the
    per-doc scoring stream — reference membership is folded into the
    aggregate instead of a filter so Catalyst shares the Exchange;
    both models are vocab²-bounded broadcast tables; one doc-keyed
    aggregate closes the plan.
    """
    keyed = docs.filter(F.col(doc_col).isNotNull()).withColumn(
        "_is_ref", F.coalesce(in_domain_pred.cast("boolean"), F.lit(False))
    )
    vocab = lm_vocab(keyed.filter(F.col("_is_ref")), text_col, vocab_size)
    bg = _bigram_stream(keyed, [doc_col, "_is_ref"], text_col)
    bg = _map_vocab(_map_vocab(bg, vocab, "v"), vocab, "w")
    g = bg.groupBy(doc_col, "_is_ref", "v", "w").agg(
        F.count("*").alias("_n")
    )
    # conditional sums, NOT filters on the grouping column (see
    # lm_perplexity: a filter would split the shared Exchange)
    models = g.groupBy("v", "w").agg(
        F.sum(
            F.when(F.col("_is_ref"), F.col("_n")).otherwise(F.lit(0))
        ).alias("c_in"),
        F.sum("_n").alias("c_gen"),
    )
    models = models.withColumn(
        "cv_in", F.sum("c_in").over(Window.partitionBy("v"))
    ).withColumn("cv_gen", F.sum("c_gen").over(Window.partitionBy("v")))
    denom_add = F.lit(alpha * (vocab_size + 1))

    def _lp(c, cv):
        return F.log(
            (F.coalesce(F.col(c), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col(cv), F.lit(0)) + denom_add)
        )

    scored = (
        g.drop("_is_ref")
        .join(F.broadcast(models), ["v", "w"], "left")
        .select(
            doc_col,
            "_n",
            _lp("c_in", "cv_in").alias("_lp_in"),
            _lp("c_gen", "cv_gen").alias("_lp_gen"),
        )
    )
    agg = scored.groupBy(doc_col).agg(
        F.sum("_n").alias("n_bigrams"),
        (F.sum(F.col("_lp_in") * F.col("_n")) / F.sum("_n")).alias("_ain"),
        (F.sum(F.col("_lp_gen") * F.col("_n")) / F.sum("_n")).alias("_agn"),
    )
    score = F.round(F.col("_agn") - F.col("_ain"), 6)
    spine = docs.select(doc_col)
    return spine.join(agg, doc_col, "left").select(
        doc_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.round("_ain", 6).alias("avg_logprob_in"),
        F.round("_agn", 6).alias("avg_logprob_gen"),
        score.alias("ml_score"),
        F.coalesce(
            score <= F.lit(float(threshold)), F.lit(False)
        ).alias("selected"),
    )


def moore_lewis_sql(
    src_sql: str,
    vocab_size: int = 10_000,
    alpha: float = 0.1,
    threshold: float = 0.0,
) -> str:
    """The IDENTICAL pinned model pair for DuckDB. ``src_sql`` yields
    (doc_id, t, is_ref) with ``t`` already whitespace-normalized
    lowercase text (the _LM_NORM_SQL contract) and ``is_ref`` the
    in-domain membership flag."""
    a = repr(float(alpha))
    da = repr(float(alpha) * (int(vocab_size) + 1))
    thr = repr(float(threshold))
    return rf"""
WITH src AS MATERIALIZED (
  SELECT doc_id, t, is_ref FROM ({src_sql})
), toks AS (
  SELECT doc_id, is_ref,
         CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(t, ' ') END AS w
  FROM src
), ref_terms AS (
  SELECT unnest(w) AS term FROM toks WHERE is_ref
), vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS c FROM ref_terms GROUP BY term
  ) ORDER BY c DESC, term ASC LIMIT {int(vocab_size)}
), bg_all AS (
  SELECT doc_id, is_ref, bg[1] AS v0, bg[2] AS w0
  FROM (
    SELECT doc_id, is_ref,
           unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
    FROM toks WHERE len(w) >= 2
  )
), bg_mapped AS (
  SELECT doc_id, is_ref,
         CASE WHEN v0 IN (SELECT term FROM vocab) THEN v0 ELSE '<unk>' END AS v,
         CASE WHEN w0 IN (SELECT term FROM vocab) THEN w0 ELSE '<unk>' END AS w
  FROM bg_all
), models AS (
  SELECT v, w,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_in,
         count(*) AS c_gen
  FROM bg_mapped GROUP BY v, w
), ctx AS (
  SELECT v, w, c_in, c_gen,
         sum(c_in) OVER (PARTITION BY v) AS cv_in,
         sum(c_gen) OVER (PARTITION BY v) AS cv_gen
  FROM models
), scored AS (
  SELECT b.doc_id,
         ln((coalesce(m.c_in, 0) + {a}) / (coalesce(m.cv_in, 0) + {da}))
           AS lp_in,
         ln((coalesce(m.c_gen, 0) + {a}) / (coalesce(m.cv_gen, 0) + {da}))
           AS lp_gen
  FROM bg_mapped b
  LEFT JOIN ctx m ON b.v = m.v AND b.w = m.w
), agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
         sum(lp_in) / count(*) AS ain,
         sum(lp_gen) / count(*) AS agn
  FROM scored GROUP BY doc_id
)
SELECT s.doc_id,
  coalesce(a.n_bigrams, 0) AS n_bigrams,
  round(a.ain, 6) AS avg_logprob_in,
  round(a.agn, 6) AS avg_logprob_gen,
  round(a.agn - a.ain, 6) AS ml_score,
  coalesce(round(a.agn - a.ain, 6) <= {thr}, false) AS selected
FROM (SELECT DISTINCT doc_id FROM src) s
LEFT JOIN agg a ON a.doc_id = s.doc_id
"""

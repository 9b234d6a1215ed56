"""T39 — bigram-LM perplexity (CCNet recipe, in-engine model)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.lm_score import (
    lm_perplexity,
    lm_vocab,
    train_bigram_lm,
)


def _py_lm(ref_texts, score, vocab_size, alpha):
    """Independent reference implementation (plain Python)."""
    def words(t):
        toks = t.lower().split()
        return toks

    counts = {}
    for t in ref_texts:
        for w in words(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    }

    def mapped(t):
        return [w if w in vocab else "<unk>" for w in words(t)]

    model, ctx = {}, {}
    for t in ref_texts:
        m = mapped(t)
        for v, w in zip(m, m[1:]):
            model[(v, w)] = model.get((v, w), 0) + 1
            ctx[v] = ctx.get(v, 0) + 1
    out = {}
    for doc_id, t in score:
        m = mapped(t)
        bgs = list(zip(m, m[1:]))
        if not bgs:
            out[doc_id] = (0, None, None)
            continue
        lps = [
            math.log(
                (model.get((v, w), 0) + alpha)
                / (ctx.get(v, 0) + alpha * (vocab_size + 1))
            )
            for v, w in bgs
        ]
        avg = round(sum(lps) / len(lps), 6)
        out[doc_id] = (len(bgs), avg, round(math.exp(-avg), 6))
    return out


def test_lm_matches_python_twin(spark):
    ref = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    score = [
        (1, "the cat sat on the mat"),
        (2, "the zebra sat on the xylophone"),  # OOV bigrams
        (3, "qq ww ee rr"),                      # all-unk
        (4, "one"),                              # no bigrams
        (5, ""),
    ]
    docs = spark.createDataFrame(score, "doc_id long, text string")
    refdf = spark.createDataFrame([(t,) for t in ref], "text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
        for r in lm_perplexity(
            docs, reference=refdf, vocab_size=6, alpha=0.5
        ).collect()
    }
    want = _py_lm(ref, score, vocab_size=6, alpha=0.5)
    assert got == want


def test_lm_vocab_deterministic_ties(spark):
    refdf = spark.createDataFrame(
        [("b b c c a a z",)], "text string"
    )
    v = {r["term"] for r in lm_vocab(refdf, vocab_size=2).collect()}
    # a/b/c all have count 2 -> ties break lexicographically
    assert v == {"a", "b"}


def test_lm_fluent_beats_gibberish(spark):
    ref = [("the quick brown fox jumps over the lazy dog " * 5,)] * 4
    refdf = spark.createDataFrame(ref, "text string")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "dog the over quick lazy fox the jumps brown"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(
        docs, reference=refdf, vocab_size=20, alpha=0.1
    ).collect()}
    assert out[1] < out[2]  # in-order prose scores as more fluent


def test_train_bigram_lm_context_totals(spark):
    refdf = spark.createDataFrame([("a b a c a b",)], "text string")
    vocab = lm_vocab(refdf, vocab_size=10)
    model = {
        (r["v"], r["w"]): (r["c_vw"], r["c_v"])
        for r in train_bigram_lm(refdf, vocab).collect()
    }
    # bigrams: (a,b) x2, (b,a), (a,c), (c,a); contexts: a=3, b=1, c=1
    assert model[("a", "b")] == (2, 3)
    assert model[("b", "a")] == (1, 1)
    assert model[("c", "a")] == (1, 1)


def test_lm_plan_broadcasts_and_stays_jvm(spark):
    docs = spark.createDataFrame(
        [(i, "w%d x y" % i) for i in range(50)], "doc_id long, text string"
    )
    plan = (
        lm_perplexity(docs, vocab_size=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # vocab/context joins never shuffle docs


def test_lm_fused_pred_matches_two_frame_path(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the dog sat on the rug"),
            (3, "de", "der hund sitzt auf dem teppich"),
            (4, "en", "a cat and a dog"),
            (5, "de", "qq ww"),
            (6, "en", "one"),
        ],
        "doc_id long, lang string, text string",
    )
    kw = dict(vocab_size=8, alpha=0.3)
    fused = lm_perplexity(
        docs, reference_pred=F.col("lang") == "en", **kw
    )
    twoframe = lm_perplexity(
        docs, reference=docs.filter(F.col("lang") == "en"), **kw
    )
    key = lambda rows: {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
        for r in rows
    }
    assert key(fused.collect()) == key(twoframe.collect())


def test_lm_fused_extracts_corpus_once(spark):
    """The fused path's bigram extraction subtree is shared between the
    model and the scoring branches (ReuseExchange) — exactly one
    extraction stage over the corpus (plus the word-grain vocab pass)."""
    import re

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"w{i} x y z w{i} x") for i in range(60)],
        "doc_id long, lang string, text string",
    )
    res = lm_perplexity(
        docs, reference_pred=F.col("lang") == "en", vocab_size=6
    )
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    gen_stages = set(re.findall(r"\*\((\d+)\) Generate", plan))
    # one word-grain Generate (vocab) + one bigram Generate (shared)
    assert len(gen_stages) == 2, plan
    assert "ReusedExchange" in plan


def test_lm_pred_and_reference_mutually_exclusive(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity(docs, reference=docs, reference_pred=F.lit(True))

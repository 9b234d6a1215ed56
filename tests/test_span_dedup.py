"""T49 duplicated token-span removal: equivalence with an independent
pure-Python reference across corpus shapes, hash-key == text-key on real
data, both removal modes, and the all-JVM / slim-shuffle plan contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.span_dedup import dedup_spans


def _reference(rows, k=8, min_count=2, mode="all"):
    """Ground truth independent of the Spark operator: literal gram
    strings, dict counting, per-token coverage marking."""
    toks = {d: t.split() for d, t in rows}
    occ = {}  # gram -> list of (doc_id, pos) in (doc_id, pos) order
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - k + 1):
            occ.setdefault(" ".join(t[p : p + k]), []).append((d, p))
    covered = {d: set() for d in toks}
    for places in occ.values():
        if len(places) < min_count:
            continue
        removable = places[1:] if mode == "keep_first" else places
        for d, p in removable:
            covered[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [w for i, w in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = dedup_spans(df, **kw).collect()
    return {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed) for r in got}


BOILER = "please subscribe to our weekly newsletter for the latest updates"

CORPORA = {
    "shared_boiler": [
        (1, "alpha beta gamma delta epsilon zeta eta theta " + BOILER),
        (2, "one two three four five six seven eight nine " + BOILER),
        (3, "totally unrelated words that match nothing else anywhere at all"),
    ],
    "shared_prefix_pair": [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail one"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail two"),
    ],
    "within_doc_repeat": [
        # the 8-gram repeats INSIDE one document — must still count as dup
        (1, "a b c d e f g h x y z a b c d e f g h q"),
        (2, "completely different content with no shared spans whatsoever here"),
    ],
    "short_and_empty": [
        (1, "short doc"),
        (2, ""),
        (3, "exactly seven words so no gram"),
        (4, "eight words exactly makes one single gram here"),
        (5, "eight words exactly makes one single gram here"),
    ],
    "overlapping_spans": [
        # two duplicated grams overlap in doc 1; coverage must merge
        (1, "p q r s t u v w x y z m n o"),
        (2, "p q r s t u v w tail"),
        (3, "head w x y z m n o p q r s t u"),
    ],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("mode", ["all", "keep_first"])
def test_matches_reference(spark, name, mode):
    rows = CORPORA[name]
    assert _run(spark, rows, k=8, mode=mode) == _reference(rows, k=8, mode=mode)


def test_random_corpus_matches_reference(spark):
    rng = random.Random(49)
    vocab = [f"w{i}" for i in range(30)]  # tiny vocab → natural collisions
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ]
    for mode in ("all", "keep_first"):
        for k in (3, 8):
            assert _run(spark, rows, k=k, mode=mode) == _reference(
                rows, k=k, mode=mode
            )


def test_min_count_threshold(spark):
    rows = [
        (1, "a b c d e f g h one"),
        (2, "a b c d e f g h two"),
        (3, "a b c d e f g h three"),
    ]
    # pair-duplicated gram survives min_count=4, dies at default
    assert _run(spark, rows, k=8, min_count=4) == _reference(
        rows, k=8, min_count=4
    )
    assert all(v[2] == 8 for v in _run(spark, rows, k=8).values())
    with pytest.raises(ValueError):
        _run(spark, rows, k=8, min_count=1)
    with pytest.raises(ValueError):
        _run(spark, rows, k=8, mode="bogus")


def test_hash_key_equals_text_key_on_real_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.concat("text", F.lit(" " + BOILER)).alias("text"))
    )
    h = dedup_spans(docs, k=8, key="hash").collect()
    t = dedup_spans(docs, k=8, key="text").collect()
    assert sorted(map(tuple, h)) == sorted(map(tuple, t))
    # the injected boiler's interior grams must actually fire
    assert sum(r.n_removed for r in h) > 0


def test_plan_all_jvm_and_text_never_shuffled(spark):
    """Contract: no Python in the plan (pure Catalyst), and the gram-keyed
    exchanges carry only slim (doc_id, pos, gk) rows — the token arrays /
    text appear below at most ONE exchange (the doc_id rebuild join),
    never the gram-grain ones."""
    df = spark.createDataFrame(
        [(i, f"tok{i} " * 20) for i in range(10)], "doc_id int, text string"
    )
    plan = dedup_spans(df, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no ArrowEvalPython / BatchEvalPython
    # gram-grain exchanges: hashpartitioning on gk — present by design
    assert "hashpartitioning(gk" in plan
    # the full token array must not ride a gram-keyed exchange
    for frag in plan.split("Exchange")[1:]:
        header = frag.split("\n", 1)[0]
        if "hashpartitioning(gk" in header:
            assert "toks" not in header

"""functions/quality.py (Gopher-style rule battery) and
operators/decontam.py (benchmark n-gram decontamination) on crafted
texts that exercise every rule — the driver-table corpus is single-line
prose, so bullets/ellipses/symbol rules only discriminate here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import (
    DEFAULT_BOUNDS,
    quality_filter,
    with_quality_rules,
)
from warcsum_spark.operators.decontam import contamination_overlap, decontaminate

GOOD = (
    "the quick brown fox jumps over the lazy dog and it runs on for a "
    "while in plain readable prose with common stopwords scattered through "
    "it to keep the classifier happy " * 3
)


def _mark(spark, texts, bounds=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = with_quality_rules(df, bounds=bounds).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_good_document_passes_all_rules(spark):
    got = _mark(spark, [GOOD])[0]
    for k, v in got.items():
        if k.startswith("rule_") or k == "keep":
            assert v is True, (k, got)


def test_each_rule_fails_for_its_pathology(spark):
    bullets = "\n".join(f"- item {i} listed" for i in range(40))
    ellipses = "\n".join(f"truncated line number {i} goes on..." for i in range(40))
    symbols = GOOD + " " + "# " * 60
    short = "too few words here"
    nonalpha = " ".join(str(i) for i in range(80)) + " the and of to a in is it"
    longwords = ("pneumonoultramicroscopicsilicovolcanoconiosis " * 60) + "the and"
    cases = [bullets, ellipses, symbols, short, nonalpha, longwords, "", None]
    got = _mark(spark, cases)
    assert got[0]["rule_bullet_lines"] is False and got[0]["bullet_line_frac"] == 1.0
    assert got[1]["rule_ellipsis_lines"] is False
    assert got[2]["rule_symbol_ratio"] is False
    assert got[3]["rule_word_count"] is False
    assert got[4]["rule_alpha_words"] is False
    assert got[5]["rule_mean_word_len"] is False
    # empty + null: zero words → every word-denominated rule fails, no NPE
    for i in (6, 7):
        assert got[i]["n_words"] in (0, None)
        assert got[i]["keep"] is False
    for case in got.values():
        assert case["keep"] is False or case["doc_id"] is None


def test_quality_filter_keeps_schema_and_survivors(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "tiny"), (3, None)], "doc_id long, text string"
    )
    out = quality_filter(df)
    assert out.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_custom_bounds_override(spark):
    got = _mark(spark, ["five words of text here"], bounds={"min_words": 5})
    assert got[0]["rule_word_count"] is True
    got = _mark(spark, ["five words of text here"], bounds={"min_words": 6})
    assert got[0]["rule_word_count"] is False


def test_contamination_overlap_counts_distinct_shingles(spark):
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # shares 2 shingles
            (11, "alpha beta gamma unrelated tail"),  # shares 1
            (12, "totally different words entirely here"),  # shares 0
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta zeta"), (2, "beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_common"]
        for r in contamination_overlap(corpus, bench, k=3).collect()
    }
    # doc 10: 'alpha beta gamma', 'beta gamma delta' (both benches),
    # 'gamma delta epsilon' (bench 2) = 3 distinct shared shingles
    assert got == {10: 3, 11: 1}

    clean = decontaminate(corpus, bench, k=3)
    assert clean.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in clean.collect()] == [12]


def test_contamination_plan_broadcasts_benchmark(spark):
    corpus = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" x y z q")).alias("text"),
    )
    bench = spark.createDataFrame([(0, "x y z q r")], "doc_id long, text string")
    plan = contamination_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_default_bounds_are_the_documented_gopher_set():
    assert DEFAULT_BOUNDS["min_words"] == 50
    assert DEFAULT_BOUNDS["min_alpha_word_frac"] == 0.8

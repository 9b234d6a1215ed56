"""functions/repetition.py (Gopher repetition battery) vs an
independent pure-Python twin on crafted and pseudo-random documents.
The twin re-derives every definition from the module docstring (split,
multiset counts, mode with largest-lexicographic tie-break) without
touching Spark, so a shared bug would have to be written twice."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.repetition import (
    DEFAULT_REPETITION_BOUNDS,
    line_repetition_measures,
    with_repetition_signals,
)


# --- independent reference -------------------------------------------------

def _ref_units(text: str, sep_re: str) -> list[str]:
    return [u for u in re.split(sep_re, text) if u.strip(" \t\n\x0b\f\r")]


def _ref_dup_fracs(units: list[str]) -> tuple[float | None, float | None]:
    if not units:
        return None, None
    distinct = set(units)
    total_chars = sum(len(u) for u in units)
    distinct_chars = sum(len(u) for u in distinct)
    char_frac = (
        None if total_chars == 0 else (total_chars - distinct_chars) / total_chars
    )
    return (len(units) - len(distinct)) / len(units), char_frac


def _ref_words(text: str) -> list[str]:
    norm = re.sub("^ | $", "", re.sub("[ \t\n\x0b\f\r]+", " ", text))
    return norm.split(" ") if norm else []


def _ref_ngrams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _ref_signals(text: str) -> dict:
    out = {}
    for prefix, sep in (("line", "\n"), ("para", "\n{2,}")):
        d, c = _ref_dup_fracs(_ref_units(text, sep))
        out[f"dup_{prefix}_frac"] = d
        out[f"dup_{prefix}_char_frac"] = c
    words = _ref_words(text)
    word_chars = sum(len(w) for w in words)
    for n in DEFAULT_REPETITION_BOUNDS["max_dup_ngram_frac"]:
        grams = _ref_ngrams(words, n)
        out[f"dup_{n}gram_frac"] = (
            None if not grams else (len(grams) - len(set(grams))) / len(grams)
        )
    for n in DEFAULT_REPETITION_BOUNDS["max_top_ngram_char_frac"]:
        grams = _ref_ngrams(words, n)
        if not grams or word_chars == 0:
            out[f"top_{n}gram_char_frac"] = None
            continue
        counts = Counter(grams)
        best = max(counts, key=lambda g: (counts[g], g))
        out[f"top_{n}gram_char_frac"] = min(
            counts[best] * (len(best) - (n - 1)) / word_chars, 1.0
        )
    return out


# --- fixtures --------------------------------------------------------------

CRAFTED = [
    "",
    "   \n  \n\t",
    "a b c\na b c\n\n\npara two here\npara two here",
    "x y x y x y x y",
    "unique line one\nunique line two\n\nsecond para",
    "single",
    "one two three four five one two three four five one two",
    "dup\ndup\ndup\ndup\nrare",
    "p1 text here\n\np1 text here\n\nother paragraph\n\n\n\nlast",
    "tab\tseparated words\nwith  double  spaces\n\nand a\x0bvertical tab",
]


def _random_docs(k: int = 40) -> list[str]:
    rng = random.Random(20260817)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "z"]
    docs = []
    for _ in range(k):
        n_lines = rng.randint(0, 8)
        lines = []
        for _ in range(n_lines):
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
            lines.append(" ".join(words))
            if rng.random() < 0.3 and lines:
                lines.append(lines[-1])  # force line dups
        sep = lambda: "\n\n" if rng.random() < 0.25 else "\n"
        docs.append(sep().join(lines))
    return docs


def _spark_signals(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = with_repetition_signals(df).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) < 1e-9


def test_matches_independent_reference(spark):
    texts = CRAFTED + _random_docs()
    got = _spark_signals(spark, texts)
    for i, t in enumerate(texts):
        want = _ref_signals(t)
        for k, v in want.items():
            assert _close(got[i][k], v), (i, k, got[i][k], v, repr(t)[:80])


def test_empty_doc_passes_all_rules(spark):
    got = _spark_signals(spark, ["", "   \n \n"])
    for r in got.values():
        assert r["keep_repetition"] is True
        for k, v in r.items():
            if k.startswith("rule_"):
                assert v is True, (k, r)


def test_repetitive_doc_fails(spark):
    boiler = ("the same exact line of boilerplate text\n" * 10) + "one other line"
    got = _spark_signals(spark, [boiler])[0]
    assert got["rule_dup_lines"] is False
    assert got["keep_repetition"] is False


def test_threshold_override(spark):
    boiler = "dup line\ndup line\nfresh line one\nfresh line two"
    lax = {"max_dup_line_frac": 0.9, "max_dup_line_char_frac": 0.9}
    df = spark.createDataFrame([(0, boiler)], "doc_id long, text string")
    row = with_repetition_signals(df, bounds=lax).collect()[0]
    assert row["rule_dup_lines"] is True


def test_array_tier_is_shuffle_free(spark):
    """The line/para/dup-ngram tier must stay a map-only projection —
    no Exchange in the plan (the whole point of the array tier)."""
    df = spark.range(10).withColumn("text", F.lit("a b\na b"))
    out = df.withColumns(line_repetition_measures(F.col("text")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_kernel_equals_relational_top_tier(spark):
    texts = CRAFTED + _random_docs()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r.asDict() for r in with_repetition_signals(df).collect()}
    b = {
        r["doc_id"]: r.asDict()
        for r in with_repetition_signals(df, top_tier="relational").collect()
    }
    assert set(a) == set(b)
    for k in a:
        for col, v in a[k].items():
            assert _close(v, b[k][col]) if isinstance(v, float) else v == b[k][col], (
                k, col, v, b[k][col],
            )


def test_kernel_battery_is_exchange_free(spark):
    """With the top-tier kernel the WHOLE battery is map-only."""
    df = spark.range(10).withColumn("text", F.lit("a b\na b"))
    plan = (
        with_repetition_signals(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan.replace("Exchange roundrobin", "rr"), plan


def test_top_tier_restages_on_mismatched_ns(spark):
    """A frame staged with a different ns set must be restaged, not
    crash on missing _rep_g{n} columns."""
    from warcsum_spark.functions.repetition import (
        stage_repetition_units,
        top_ngram_char_fracs,
    )

    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    staged_5_10 = stage_repetition_units(df, ns=(5, 10))
    out = top_ngram_char_fracs(staged_5_10, ns=(2, 3, 4)).collect()
    assert len(out) == 1 and out[0]["top_2gram_char_frac"] is not None

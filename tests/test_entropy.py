"""T66 — entropy/compressibility signals: expression tier vs the
pure-Python reference, Arrow byte tier vs expression tier on
alphabet-only inputs, zlib ratio pins, and plan shape (map-only)."""

from __future__ import annotations

import math
import zlib

import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.entropy import (
    ALPHABET,
    byte_entropy,
    compress_ratio,
    ref_char_entropy,
    with_char_entropy,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaa",
    "Buy NOW!!! Buy NOW!!! Buy NOW!!!",
    "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0",
    "",
    "    ",
    "MixedCASE text, with Punct-uation; and (brackets) everywhere!",
    "0123456789 9876543210",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_expression_tier_matches_reference(spark, docs):
    got = {
        r.doc_id: (r.entropy, r.n_symbols, r.distinct_symbols)
        for r in with_char_entropy(docs).collect()
    }
    for i, t in enumerate(TEXTS):
        import re

        n = re.sub(r"^ +| +$", "", re.sub(r"[^a-z0-9]+", " ", t.lower()))
        assert got[i][0] == pytest.approx(ref_char_entropy(t), abs=1e-9)
        assert got[i][1] == len(n)
        assert got[i][2] == len({c for c in n})


def test_entropy_tails(spark, docs):
    """Monotone sanity: constant text ~0 bits, varied text > 3 bits."""
    got = {r.doc_id: r.entropy for r in with_char_entropy(docs).collect()}
    assert got[1] == 0.0  # single repeated symbol
    assert got[0] > 3.0  # pangram
    assert got[4] == 0.0 and got[5] == 0.0  # empty / whitespace-only


def test_byte_tier_agrees_on_alphabet_inputs(spark):
    """For text already inside the 37-symbol alphabet (single spaces,
    no leading/trailing), UTF-8 bytes == normalized chars, so the two
    tiers compute the same distribution."""
    texts = [
        "the quick brown fox",
        "aaa bbb ccc",
        "0 1 2 3 4 5 6 7 8 9",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = (
        df.select(
            "text",
            byte_entropy(F.col("text")).alias("be"),
        )
        .collect()
    )
    for r in rows:
        # ref rounds to 6 at output (the expression-tier contract)
        assert round(r.be, 6) == pytest.approx(
            ref_char_entropy(r.text), abs=1e-9
        )


def test_byte_tier_separates_base64_from_padding(spark):
    import base64, random

    rng = random.Random(3)
    blob = base64.b64encode(bytes(rng.randrange(256) for _ in range(3000))).decode()
    df = spark.createDataFrame(
        [("pad", "x" * 3000), ("b64", blob)], "k string, text string"
    )
    got = {r.k: r.be for r in df.select("k", byte_entropy("text").alias("be")).collect()}
    assert got["pad"] == 0.0
    assert got["b64"] > 5.5


def test_compress_ratio(spark):
    texts = ["y" * 5000, "the quick brown fox jumps over the lazy dog " * 40]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.cr for r in df.select(compress_ratio("text").alias("cr")).collect()]
    for t, g in zip(texts, got):
        raw = t.encode()
        assert g == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert got[0] < 0.05  # pure padding crushes
    # nulls/empties
    df2 = spark.createDataFrame([(None,), ("",)], "text string")
    assert [r.cr for r in df2.select(compress_ratio("text").alias("cr")).collect()] == [None, None]


def test_map_only_plan(spark, docs):
    plan = (
        with_char_entropy(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan

"""T78 CCNet-style per-language quality bucketing (operators/ccnet.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.ccnet import (
    rank_buckets,
    rank_cuts,
    threshold_buckets,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, score double")


def _ref_buckets(rows, n_buckets=3, labels=("head", "middle", "tail")):
    by_lang: dict[str, list] = {}
    for i, lang, v in rows:
        by_lang.setdefault(lang, []).append((v, i))
    out = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for r, (_v, i) in enumerate(vals, start=1):
            out[i] = labels[math.floor(n_buckets * (r - 1) / n)]
    return out


@pytest.fixture(scope="module")
def rows():
    # deterministic scores, three languages of different sizes incl. a
    # 1-doc and a 2-doc group (every doc of a tiny group must still get
    # a label; floor puts 1-doc groups in head)
    rows = []
    for i in range(90):
        rows.append((i, "en", float((i * 37) % 89)))
    for i in range(90, 120):
        rows.append((i, "de", float((i * 11) % 23)))
    rows.append((120, "xx", 5.0))
    rows.extend([(121, "yy", 2.0), (122, "yy", 1.0)])
    return rows


def test_rank_buckets_matches_reference(spark, rows):
    got = {
        r.doc_id: r.bucket
        for r in rank_buckets(_mkdocs(spark, rows), "score").collect()
    }
    assert got == _ref_buckets(rows)


def test_rank_buckets_balanced_within_one(spark, rows):
    out = rank_buckets(_mkdocs(spark, rows), "score")
    sizes = (
        out.groupBy("lang", "bucket").count().collect()
    )
    per_lang: dict[str, list[int]] = {}
    for r in sizes:
        per_lang.setdefault(r.lang, []).append(r["count"])
    for lang, counts in per_lang.items():
        if len(counts) > 1:
            assert max(counts) - min(counts) <= 1, (lang, counts)


def test_ties_are_deterministic(spark):
    rows = [(i, "en", 1.0) for i in range(9)]  # all tied
    got = {
        r.doc_id: r.bucket
        for r in rank_buckets(_mkdocs(spark, rows), "score").collect()
    }
    # id tiebreak: 0-2 head, 3-5 middle, 6-8 tail
    assert got == _ref_buckets(rows)
    assert got[0] == "head" and got[4] == "middle" and got[8] == "tail"


def test_threshold_buckets_reproduce_rank_buckets(spark, rows):
    """Cuts taken at the exact bucket boundaries reproduce the rank
    assignment — scores here are unique within each language, so no
    boundary ties exist and agreement is exact."""
    docs = _mkdocs(spark, rows)
    cuts = rank_cuts(docs, "score")
    exact = {
        r.doc_id: r.bucket for r in rank_buckets(docs, "score").collect()
    }
    thr = {
        r.doc_id: r.bucket
        for r in threshold_buckets(docs, cuts, "score").collect()
    }
    assert thr == exact


def test_threshold_buckets_from_hdr_sketch(spark):
    """The 100 TB path: cuts from the T64 HDR sketch. Sketch cuts are
    lower bounds with relative error < 2^-sub_bits, so bucket
    FRACTIONS per group stay within sketch error of 1/3."""
    from warcsum_spark.operators.quantiles import hdr_quantiles, hdr_sketch

    rows = [(i, "en", float(1000 + (i * 193) % 997)) for i in range(300)]
    docs = _mkdocs(spark, rows).withColumn(
        "iscore", F.col("score").cast("long")
    )
    sketch = hdr_sketch(docs, ["lang"], "iscore")
    cuts = hdr_quantiles(sketch, ["lang"], [1 / 3, 2 / 3]).select(
        "lang", "q", F.col("value").cast("double").alias("value")
    )
    out = threshold_buckets(docs, cuts, "score")
    frac = {
        r.bucket: r["count"] / 300
        for r in out.groupBy("bucket").count().collect()
    }
    assert set(frac) == {"head", "middle", "tail"}
    for b, f in frac.items():
        assert abs(f - 1 / 3) < 0.08, (b, frac)


def test_composes_with_lm_perplexity(spark):
    """Production composition: T39 scores → T78 buckets, one lazy plan."""
    from warcsum_spark.operators.lm_score import lm_perplexity

    texts = [
        (i, "en", " ".join("the quick brown fox jumps".split()[j % 5]
                           for j in range(i % 7 + 3)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, lang string, text string")
    scored = lm_perplexity(docs)  # self-perplexity
    out = rank_buckets(
        scored.join(docs.select("doc_id", "lang"), "doc_id"),
        "perplexity",
        ("lang",),
    )
    got = out.select("doc_id", "bucket").collect()
    assert len(got) == 30
    assert {r.bucket for r in got} == {"head", "middle", "tail"}


def test_labels_and_nbuckets_validation(spark, rows):
    docs = _mkdocs(spark, rows)
    with pytest.raises(ValueError, match="labels"):
        rank_buckets(docs, "score", n_buckets=4, labels=("a", "b"))
    with pytest.raises(ValueError, match="n_buckets"):
        rank_buckets(docs, "score", n_buckets=1)
    out = rank_buckets(docs, "score", n_buckets=4)
    assert {r.bucket for r in out.collect()} <= {"b0", "b1", "b2", "b3"}

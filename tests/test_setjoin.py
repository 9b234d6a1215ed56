"""T50 prefix-filtered set-similarity join: exact-output equality with
the brute-force join across corpora/thresholds/shingle sizes, prefix
length arithmetic (incl. the float-ceil trap), pruning effectiveness,
and the no-cartesian/no-Python plan contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import ngram_jaccard_pairs
from warcsum_spark.operators.setjoin import _prefix_shingles, similarity_join


def _random_corpus(seed, n_docs=50, vocab=40, max_len=30, dup=8):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, max_len))))
        for i in range(n_docs)
    ]
    rows += [(1000 + i, rows[i][1] + " tail") for i in range(dup)]
    return rows


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
@pytest.mark.parametrize("k", [2, 3])
def test_equals_bruteforce_random(spark, threshold, k):
    df = spark.createDataFrame(_random_corpus(50), "doc_id int, text string")
    fast = sorted(map(tuple, similarity_join(df, threshold=threshold, k=k).collect()))
    brute = sorted(map(tuple, ngram_jaccard_pairs(df, k=k, threshold=threshold).collect()))
    assert fast == brute


def test_equals_bruteforce_stopword_heavy(spark):
    """Every doc shares a universal boilerplate — the shape that melts
    the brute-force join; output must still be identical."""
    rng = random.Random(7)
    boiler = "all rights reserved terms of service apply"
    rows = [
        (i, f"{boiler} doc {i} body " + " ".join(
            rng.choice("abcdefgh") for _ in range(10)))
        for i in range(40)
    ]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact dups too
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for t in (0.4, 0.9):
        fast = sorted(map(tuple, similarity_join(df, threshold=t, k=3).collect()))
        brute = sorted(map(tuple, ngram_jaccard_pairs(df, k=3, threshold=t).collect()))
        assert fast == brute
        assert len(fast) >= 5  # the exact dups must surface


def test_prefix_length_exact(spark):
    """Prefix keeps exactly n - ceil(t*n) + 1 shingles per doc, with
    ceil computed on the EXACT product: t=0.1, n=30 must give 28, not
    the 27 that naive float ceil(3.0000000000000004) yields."""
    rows = [(1, " ".join(f"u{i}" for i in range(31)))]  # 30 distinct 2-shingles
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from warcsum_spark.operators.dedup import _shingle_hash_array

    base = (
        df.select(
            "doc_id",
            F.array_sort(F.array_distinct(_shingle_hash_array("text", 2))).alias(
                "sh_set"
            ),
        )
        .withColumn("n_sh", F.size("sh_set"))
    )
    assert base.collect()[0].n_sh == 30
    for t, want in [(0.1, 28), (0.5, 16), (0.8, 7), (1.0, 1)]:
        got = _prefix_shingles(base, t).count()
        assert got == want == 30 - math.ceil(round(t * 30, 9)) + 1


def test_prefix_prunes_universal_shingles(spark):
    """A shingle in every doc is corpus-max frequency, so rarity-first
    prefixes exclude it whenever the doc has enough rarer shingles —
    prefix rows must be well under the full shingle explosion."""
    rows = [
        (i, "common head phrase here " + " ".join(f"r{i}_{j}" for j in range(20)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from warcsum_spark.operators.dedup import _shingle_hash_array

    base = (
        df.select(
            "doc_id",
            F.array_sort(F.array_distinct(_shingle_hash_array("text", 3))).alias(
                "sh_set"
            ),
        )
        .withColumn("n_sh", F.size("sh_set"))
    )
    total = base.select(F.sum("n_sh")).collect()[0][0]
    pre = _prefix_shingles(base, 0.8)
    assert pre.count() < total * 0.3
    # and the universal shingles are never in any prefix at t=0.8
    universal = (
        base.select(F.explode("sh_set").alias("sh"))
        .groupBy("sh").count().filter(F.col("count") == 30)
    )
    assert pre.join(universal.select("sh"), "sh").count() == 0


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            similarity_join(df, threshold=bad)


def test_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(_random_corpus(51, n_docs=10), "doc_id int, text string")
    plan = (
        similarity_join(df, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# T53 containment_join
# ---------------------------------------------------------------------------

from warcsum_spark.operators.setjoin import containment_join  # noqa: E402


def _brute_containment(rows, t, k=3):
    import itertools

    def sh(text):
        w = text.lower().strip().split()
        return set(" ".join(w[i : i + k]) for i in range(len(w) - k + 1))

    s = {d: sh(x) for d, x in rows if sh(x)}
    return set(
        (a, b, round(len(s[a] & s[b]) / len(s[a]), 6))
        for a, b in itertools.permutations(s, 2)
        if len(s[a] & s[b]) / len(s[a]) >= t
    )


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_containment_equals_bruteforce(spark, threshold):
    rng = random.Random(53)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(50)
    ]
    rows += [
        (100 + i, rows[i][1] + " " + rows[i + 1][1] + " extra tail words here")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = set(map(tuple, containment_join(df, threshold=threshold, k=3).collect()))
    assert got == _brute_containment(rows, threshold)


def test_containment_catches_what_jaccard_misses(spark):
    """A 6-word quote inside a 60-word page: containment 1.0, Jaccard
    far below any useful threshold — the directed join must find it,
    the symmetric one must not."""
    quote = "the quick brown fox jumps high"
    page = quote + " " + " ".join(f"filler{i}" for i in range(54))
    df = spark.createDataFrame(
        [(1, quote), (2, page)], "doc_id int, text string"
    )
    cont = {(r.doc_a, r.doc_b): r.containment
            for r in containment_join(df, threshold=0.9, k=3).collect()}
    assert cont == {(1, 2): 1.0}
    assert similarity_join(df, threshold=0.5, k=3).count() == 0


def test_containment_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    with pytest.raises(ValueError):
        containment_join(df, threshold=0.0)
    plan = (
        containment_join(df, threshold=0.8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Python" not in plan

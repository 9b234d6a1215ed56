"""T62 incremental cross-batch MinHash dedup (operators/incremental.py):
batch-vs-index semantics vs the within-corpus T1 operator, index
maintenance, and the broadcast/no-index-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import minhash_signatures
from warcsum_spark.operators.incremental import cross_batch_duplicates, merge_index

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "a completely different document about spark shuffles and joins"),
    (2, "numbers one two three four five six seven eight nine ten"),
    (3, "rare words zephyr quixotic jabberwocky vorpal snicker snack"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copy_found_novel_missed(spark):
    index = minhash_signatures(_docs(spark, CORPUS), with_bands=True)
    batch = _docs(
        spark,
        [
            (100, CORPUS[0][1]),  # exact copy of doc 0
            (101, "entirely novel content nothing shares these tokens"),
        ],
    )
    dups, new_sigs = cross_batch_duplicates(batch, index, threshold=0.5)
    got = {(r.new_id, r.index_id): r.est_jaccard for r in dups.collect()}
    assert got == {(100, 0): 1.0}
    assert new_sigs.count() == 2


def test_matches_within_corpus_operator(spark):
    # batch-vs-index on (corpus, copies) must find the same cross pairs
    # as the T1 self-join run on corpus ∪ copies, restricted to
    # (new, old) — an independent implementation cross-check
    from warcsum_spark.operators.dedup import minhash_lsh_duplicates

    copies = [(100 + i, t) for i, t in CORPUS[:2]]
    index = minhash_signatures(_docs(spark, CORPUS), with_bands=True)
    dups, _ = cross_batch_duplicates(_docs(spark, copies), index, threshold=0.5)
    got = {(r.new_id, r.index_id, r.n_bands, r.est_jaccard) for r in dups.collect()}
    both = minhash_lsh_duplicates(
        _docs(spark, CORPUS + copies), threshold=0.5
    )
    want = {
        (r.doc_b, r.doc_a, r.n_bands, r.est_jaccard)
        for r in both.collect()
        if r.doc_b >= 100 and r.doc_a < 100
    }
    assert got == want and got


def test_merge_index_appends_survivors_only(spark):
    index = minhash_signatures(_docs(spark, CORPUS), with_bands=True)
    batch = _docs(spark, [(100, CORPUS[0][1]), (101, "totally fresh unseen words here")])
    dups, new_sigs = cross_batch_duplicates(batch, index, threshold=0.5)
    merged = merge_index(index, new_sigs, dups)
    ids = {r.doc_id for r in merged.select("doc_id").collect()}
    assert ids == {0, 1, 2, 3, 101}
    # a second identical batch now dedups against the APPENDED survivor
    dups2, _ = cross_batch_duplicates(
        _docs(spark, [(200, "totally fresh unseen words here")]), merged, threshold=0.5
    )
    assert {(r.new_id, r.index_id) for r in dups2.collect()} == {(200, 101)}


def test_index_not_shuffled_plan(spark):
    index = minhash_signatures(_docs(spark, CORPUS), with_bands=True)
    batch = _docs(spark, [(100, CORPUS[0][1])])
    dups, _ = cross_batch_duplicates(batch, index, threshold=0.5)
    plan = dups._jdf.queryExecution().executedPlan().toString()
    # candidate join must be broadcast (new side), not a shuffled join
    assert "BroadcastHashJoin" in plan

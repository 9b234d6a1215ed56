"""Dedup family: exact vs md5 groundtruth; MinHash-LSH and SimHash recall
against exact n-gram Jaccard on seeded near-duplicate documents."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)


def _near_dup_docs(spark, n_base=30, seed=42):
    """Base docs + near-dup variants (a few words changed) + exact copies."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    did = 0
    for b in range(n_base):
        words = [rng.choice(vocab) for _ in range(60)]
        rows.append((did, " ".join(words)))
        base_id = did
        did += 1
        if b % 3 == 0:  # near-dup: change 3 words
            w2 = list(words)
            for _ in range(3):
                w2[rng.randrange(len(w2))] = rng.choice(vocab)
            rows.append((did, " ".join(w2)))
            did += 1
        if b % 5 == 0:  # exact copy
            rows.append((did, " ".join(words)))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_exact_duplicates(spark):
    df, rows = _near_dup_docs(spark)
    out = exact_duplicates(df).collect()
    by_text: dict[str, list[int]] = {}
    for did, text in rows:
        by_text.setdefault(text, []).append(did)
    for r in out:
        group = by_text[dict(rows)[r["doc_id"]]]
        assert r["group_size"] == len(group)
        assert r["canonical_id"] == min(group)
        assert r["is_duplicate"] == (r["doc_id"] != min(group))


def test_ngram_jaccard_exact_copies_have_jaccard_1(spark):
    df, rows = _near_dup_docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()}
    by_text: dict[str, list[int]] = {}
    for did, text in rows:
        by_text.setdefault(text, []).append(did)
    for text, ids in by_text.items():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert pairs.get((ids[i], ids[j])) == 1.0


def test_minhash_lsh_recall_vs_exact(spark):
    df, _ = _near_dup_docs(spark)
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, k=3, threshold=0.8).collect()
    }
    assert truth, "fixture must contain high-jaccard pairs"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_duplicates(df, k=3, num_hashes=64, bands=16, threshold=0.6).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(truth)} truth pairs)"


def test_simhash_pigeonhole_complete_at_d10(spark):
    """The (d+1)-block candidate set must find EVERY pair within Hamming d
    (completeness is exact by pigeonhole, not probabilistic) — regression
    for the 4-block/max_hamming=10 mismatch."""
    df, _ = _near_dup_docs(spark, n_base=40, seed=7)
    sims = simhash(df)
    sig = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    d = 10
    truth = {
        (a, b)
        for a in sig
        for b in sig
        if a < b and bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1") <= d
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sims, max_hamming=d).collect()
    }
    assert set(got) == truth
    for (a, b), h in got.items():
        assert h == bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")


def test_simhash_invalid_params_raise(spark):
    df, _ = _near_dup_docs(spark, n_base=3)
    sims = simhash(df)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(sims, max_hamming=10, n_blocks=4)


def test_simhash_near_pairs(spark):
    df, rows = _near_dup_docs(spark)
    sims = simhash(df)
    # identical text → identical simhash → hamming 0
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_pairs(sims, max_hamming=3).collect()}
    by_text: dict[str, list[int]] = {}
    for did, text in rows:
        by_text.setdefault(text, []).append(did)
    exact_pairs = [
        (ids[i], ids[j])
        for ids in by_text.values()
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
    ]
    assert exact_pairs
    for p in exact_pairs:
        assert pairs.get(p) == 0, p


def test_simhash_null_text_yields_null_not_crash(spark):
    """Regression: one null-text doc (failed HTML extraction) must not
    kill the whole simhash pass — it gets a null signature."""
    from warcsum_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "hello world")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert rows[2] is None
    assert rows[1] is not None and rows[1] == rows[3]


def test_simhash_near_pairs_single_block_exact_dups(spark):
    """Regression: n_blocks=1 (width-64 block = exact-duplicate pairing)
    overflowed the mask literal; it must work and find exact pairs only."""
    from warcsum_spark.operators.dedup import simhash, simhash_near_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text here")],
        "doc_id long, text string",
    )
    pairs = simhash_near_pairs(simhash(df), max_hamming=0, n_blocks=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_lsh_candidate_pairs_rejects_band_mismatch(spark):
    """A precomputed bands column stamped with a different band count than
    the `bands` argument must raise, not silently use the kernel's
    banding."""
    import pytest

    from warcsum_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "one two three four six")],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs, with_bands=True, bands=16)
    with pytest.raises(ValueError, match="16 bands but bands=8"):
        lsh_candidate_pairs(sig, bands=8)
    # matching request is fine, as is a metadata-free frame (trusted)
    assert lsh_candidate_pairs(sig, bands=16).count() >= 1


def test_ngram_jaccard_cache_escape_hatch(spark):
    """cache=False must produce a plan without an InMemoryRelation (and
    identical results)."""
    from warcsum_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    # uncached FIRST: once cache=True registers the shingle plan, the
    # cache manager substitutes InMemoryRelation into any equal plan
    uncached = ngram_jaccard_pairs(docs, threshold=0.5, cache=False)
    assert "InMemoryRelation" not in uncached._jdf.queryExecution().toString()
    cached = ngram_jaccard_pairs(docs, threshold=0.5)
    assert sorted(map(tuple, uncached.collect())) == sorted(
        map(tuple, cached.collect())
    )

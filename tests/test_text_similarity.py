"""Text-analysis functions + similarity search, vs. numpy/python oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from warcsum_spark.functions.text import (
    lang_id,
    md5_fingerprint,
    quality_features,
    token_count,
    winnow_fingerprint,
)
from warcsum_spark.operators.similarity import brute_force_topk, lsh_topk


def test_token_count_and_quality(spark):
    rows = [
        (1, "the cat and the hat . it is on a mat ."),
        (2, ""),
        (3, "   "),
        (4, "one"),
        (5, "a  b\t c\nd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = quality_features(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", token_count(F.col("text")).alias("tc"), *[v.alias(k) for k, v in feats.items()]
        ).collect()
    }
    assert out[1]["tc"] == 12
    assert out[2]["tc"] == 0 and out[3]["tc"] == 0
    assert out[4]["tc"] == 1
    assert out[5]["tc"] == 4
    assert out[1]["stopword_ratio"] > 0
    assert out[2]["punct_ratio"] == 0.0


def test_lang_id(spark):
    rows = [
        (1, "the quick fox and the dog of to the moon"),
        (2, "le chat et la maison et les arbres"),
        (3, "der hund und die katze und das haus"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "und"}


def test_fingerprints(spark):
    rows = [(1, "abcdefgh " * 20), (2, "abcdefgh " * 20), (3, "totally different text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        md5_fingerprint(F.col("text")).alias("fp"),
        winnow_fingerprint(F.col("text")).alias("wfp"),
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["fp"] == by[2]["fp"] != by[3]["fp"]
    assert by[1]["wfp"] == by[2]["wfp"]
    assert len(by[1]["fp"]) == 16
    assert len(by[1]["wfp"]) > 0


def test_winnow_vectorized_matches_scalar_spec(spark):
    """The numpy winnowing kernel must equal the scalar executable spec on
    adversarial inputs (ties, short docs, unicode, None)."""
    import random

    from warcsum_spark.functions.text import _winnow_scalar

    rng = random.Random(9)
    cases = [
        None,
        "",
        "short",
        "exactly8",
        "aaaaaaaaaaaaaaaaaaaaaa",  # all-tie windows
        "abcdefgh " * 50,
        "héllo wörld ünïcode " * 10,
        "".join(rng.choice("ab ") for _ in range(500)),
        "".join(chr(rng.randrange(32, 1000)) for _ in range(300)),
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, text string")
    got = {r["i"]: r["w"] for r in df.select("i", winnow_fingerprint(F.col("text")).alias("w")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == _winnow_scalar(c), f"case {i}: {c!r}"


def test_winnow_vectorized_throughput():
    """≥5× the former per-byte Python loop on a 1 MB doc (VERDICT #10);
    measured against the scalar spec, which is strictly faster-shaped than
    the old numpy-scalar mix."""
    import time

    from warcsum_spark.functions.text import _winnow_scalar

    doc = ("lorem ipsum dolor sit amet " * 40000)[: 1 << 20]
    # vectorized path, invoked directly (not through Spark) for timing
    import pandas as pd

    vec = winnow_fingerprint.func

    def best_of(fn, n=3):
        # min-of-N: robust to ambient co-tenant load spikes on one trial
        best, out = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_vec, out_vec = best_of(lambda: vec(pd.Series([doc]))[0])
    t_scalar, out_scalar = best_of(lambda: _winnow_scalar(doc))
    assert list(out_vec) == out_scalar
    assert t_scalar / t_vec >= 5, (t_scalar, t_vec)


def _vecs(n, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float32)


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    got = brute_force_topk(corpus, queries, k=5).collect()

    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    for qid in range(3):
        q = V[qid]
        scores = []
        for vid, v in V.items():
            if vid < 3:
                continue
            s = float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            scores.append((round(s, 6), vid))
        expect = [vid for s, vid in sorted(scores, key=lambda t: (-t[0], t[1]))[:5]]
        mine = [r["vec_id"] for r in sorted((x for x in got if x["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == expect, qid


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = brute_force_topk(corpus, queries, k=10).collect()
    # tiny corpus + random vectors → weak top-k similarities; use few bits
    # and many tables (recall 1-(1-p^b)^T with per-bit p = 1 - θ/π)
    approx = lsh_topk(corpus, queries, k=10, dim=dim, n_bits=4, n_tables=16).collect()
    e = {(r["query_id"], r["vec_id"]) for r in exact}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    from warcsum_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = brute_force_topk(corpus, queries, k=10).collect()
    approx = ivf_topk(corpus, queries, k=10, n_centroids=8, n_probe=4).collect()
    e = {(r["query_id"], r["vec_id"]) for r in exact}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(e & a) / len(e)
    # probing half the centroid space must recover well over half the
    # true neighbors on random vectors
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    again = ivf_topk(corpus, queries, k=10, n_centroids=8, n_probe=4).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))  # seeded


def test_embedding_near_dup_recall(spark, sf_dir):
    from warcsum_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    copies = emb.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(corpus, threshold=0.99, dim=dim).collect()
    }
    # every injected exact copy must be found with cosine 1.0 (identical
    # vectors share every LSH bucket — recall is exactly 1 for true dups)
    for i in range(15):
        assert got.get((i, i + 1000000)) == 1.0, i


def test_multimodal_plumbing(spark):
    from warcsum_spark.operators.multimodal import (
        attach_media_meta,
        extract_features,
        sample_frames,
    )

    rows = [
        (1, "image", "image/png", b"\x89PNG fake bytes", 0),
        (2, "video", "video/mp4", b"\x00mp4 fake", 3500),
        (3, "audio", "audio/wav", b"RIFF fake", 2000),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, blob binary, duration_ms int"
    )
    meta = attach_media_meta(media).collect()
    assert {r["media_id"]: r["n_bytes"] for r in meta} == {1: 15, 2: 9, 3: 9}

    feats = extract_features(media, dim=32).collect()
    assert all(r["feat_dim"] == 32 and len(r["feature"]) == 32 for r in feats)
    # determinism: same blob → same features
    feats2 = extract_features(media, dim=32).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in feats2
    }

    frames = sample_frames(media, every_ms=1000).collect()
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["ts_ms"])
    assert per[2] == [0, 1000, 2000, 3000]
    assert per[3] == [0, 1000]

    with pytest.raises(Exception, match="NotImplementedError|real image"):
        extract_features(media, dim=8, use_real_codec=True).collect()


def test_cosine_batch_one_sided_null_scores_null(spark):
    """One null vector in a pair must yield a null score per the
    contract — not a batch-killing length-mismatch ValueError."""
    from warcsum_spark.operators.similarity import cosine_batch

    df = spark.createDataFrame(
        [(0, [1.0, 2.0], [1.0, 2.0]), (1, [3.0, 4.0], None), (2, None, None)],
        "id long, a array<double>, b array<double>",
    )
    rows = {r["id"]: r["c"] for r in df.select("id", cosine_batch("a", "b").alias("c")).collect()}
    assert abs(rows[0] - 1.0) < 1e-12
    assert rows[1] is None and rows[2] is None

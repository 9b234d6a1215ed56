"""T40 — DSIR hashed-bigram importance weights."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from warcsum_spark.operators.dsir import dsir_scores, dsir_weights


def _bucket(v, w, B):
    return int(hashlib.md5(f"{v} {w}".encode()).hexdigest()[:8], 16) % B


def _py_dsir(target, raw, B, alpha, bucket=_bucket):
    def feats(t):
        toks = t.lower().split()
        return [bucket(v, w, B) for v, w in zip(toks, toks[1:])]

    ct, cr = {}, {}
    for t in target:
        for b in feats(t):
            ct[b] = ct.get(b, 0) + 1
    for _, t in raw:
        for b in feats(t):
            cr[b] = cr.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lw = {
        b: math.log(
            ((ct.get(b, 0) + alpha) / (nt + alpha * B))
            / ((cr.get(b, 0) + alpha) / (nr + alpha * B))
        )
        for b in set(ct) | set(cr)
    }
    out = {}
    for doc_id, t in raw:
        fs = feats(t)
        if not fs:
            out[doc_id] = (0, None, None)
            continue
        s = sum(lw[b] for b in fs)
        out[doc_id] = (len(fs), round(s, 6), round(s / len(fs), 6))
    return out


def test_dsir_matches_python_twin(spark):
    target = ["the cat sat on the mat", "the dog sat on the rug"]
    raw = [
        (1, "the cat sat on the mat"),
        (2, "zz qq ww ee"),
        (3, "the dog sat"),
        (4, "one"),
        (5, ""),
    ]
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"], r["avg_log_weight"])
        for r in dsir_scores(rdf, tdf, n_buckets=64, alpha=0.1).collect()
    }
    want = _py_dsir(target, raw, B=64, alpha=0.1)
    assert got == want


def test_dsir_target_like_docs_score_higher(spark):
    target = [("the cat sat on the mat " * 3,)] * 3
    raw = [
        (1, "the cat sat on the mat"),   # matches target distribution
        (2, "alpha beta gamma delta"),   # disjoint
    ]
    out = {
        r["doc_id"]: r["avg_log_weight"]
        for r in dsir_scores(
            spark.createDataFrame(raw, "doc_id long, text string"),
            spark.createDataFrame(target, "text string"),
            n_buckets=256,
        ).collect()
    }
    assert out[1] > out[2]


def test_dsir_weights_bounded_by_buckets(spark):
    tdf = spark.createDataFrame([("a b c d e f g h i j",)], "text string")
    rdf = spark.createDataFrame(
        [("k l m n o p q r s t",)], "text string"
    )
    w = dsir_weights(tdf, rdf, n_buckets=8)
    rows = w.collect()
    assert len(rows) <= 8
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_dsir_plan_broadcasts_weights(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y z") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        dsir_scores(docs, docs.limit(10), n_buckets=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the weight table never shuffles docs


def _bucket_xx(v, w, B):
    """Spark's F.xxhash64(v, w) chain: per-column XXH64 over UTF-8 bytes
    with the running hash as the next seed, result reinterpreted as a
    SIGNED 64-bit long, then pmod."""
    from warcsum_spark.oracle_refs import xxh64

    h = xxh64(v.encode(), 42)
    h = xxh64(w.encode(), h)
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return signed % B  # python % is pmod for positive modulus


def test_dsir_xxhash_tier_matches_python_twin(spark):
    """The scale tier (hash_fn='xxhash64') under the same estimator:
    exact equality against the pure-Python twin re-run with the
    seed-chained XXH64 bucket — pins both the hash chain and that the
    tier changes ONLY bucket membership, not the math."""
    target = ["the cat sat on the mat", "the dog sat on the rug"]
    raw = [
        (1, "the cat sat on the mat"),
        (2, "zz qq ww ee"),
        (3, "the dog sat"),
        (4, "one"),
        (5, ""),
    ]
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"], r["avg_log_weight"])
        for r in dsir_scores(
            rdf, tdf, n_buckets=64, alpha=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert got == _py_dsir(target, raw, 64, 0.5, bucket=_bucket_xx)


def test_dsir_rejects_unknown_hash(spark):
    import pytest

    tdf = spark.createDataFrame([("a b",)], "text string")
    rdf = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_scores(rdf, tdf, hash_fn="fnv")

"""operators/cdc.py (T116) — content-defined chunking: engine kernel vs
the byte-at-a-time plain-int reference (oracle_refs.ref_cdc_doc), chunk
coverage/size invariants, the boundary-resynchronization property that
is CDC's whole point, dedup accounting algebra, batch-composition and
partitioning invariance, and null/empty/multibyte edge cases."""

from __future__ import annotations

import hashlib

import pytest

from warcsum_spark.operators.cdc import (
    _cdc_chunks_udf,
    cdc_chunk_docs,
    cdc_dedup_accounting,
)
from warcsum_spark.oracle_refs import ref_cdc_doc

MIN, NORMAL, MAX = 32, 128, 512


def _mk_text(seed: int, n_words: int = 200) -> str:
    words = []
    x = seed * 2654435761 % (1 << 32)
    for _ in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(f"w{x % 9973}")
    return " ".join(words)


def _corpus():
    docs = [(i, _mk_text(i)) for i in range(1, 9)]
    docs += [
        (100, docs[0][1]),  # exact dup of doc 1
        (101, "x" + docs[1][1]),  # doc 2 with one byte prepended
        (102, None),
        (103, ""),
        (104, "tiny"),
        (105, "héllo wörld " * 40),  # multibyte utf-8
    ]
    return docs


def _run_chunks(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = cdc_chunk_docs(df, MIN, NORMAL, MAX)
    out = {}
    for r in res.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["offset"], r["length"], r["chunk_hash"])
        )
    return {d: sorted(v) for d, v in out.items()}


def test_engine_matches_per_row_reference(spark):
    docs = _corpus()
    got = _run_chunks(spark, docs)
    for doc_id, text in docs:
        ref = ref_cdc_doc(text, MIN, NORMAL, MAX)
        if text is None:
            assert doc_id not in got
            continue
        exp = [
            (i, off, ln, hx) for i, (off, ln, hx) in enumerate(ref or [])
        ]
        assert got.get(doc_id, []) == exp, doc_id


def test_coverage_and_size_invariants(spark):
    got = _run_chunks(spark, _corpus())
    for doc_id, chunks in got.items():
        # contiguous cover: offsets chain, lengths sum to the byte length
        pos = 0
        for _, off, ln, _ in chunks:
            assert off == pos and ln > 0
            pos += ln
        for _, _, ln, _ in chunks[:-1]:
            assert MIN <= ln <= MAX
        assert chunks[-1][2] <= MAX


def test_boundary_resynchronization(spark):
    # one byte prepended: chunk boundaries resync within a window, so
    # most chunk HASHES are shared with the unshifted original
    docs = _corpus()
    got = _run_chunks(spark, docs)
    orig = {h for _, _, _, h in got[2]}
    shifted = {h for _, _, _, h in got[101]}
    shared = orig & shifted
    assert len(shared) >= max(len(orig) - 2, 1)  # only the head differs


def test_exact_dup_same_chunks(spark):
    got = _run_chunks(spark, _corpus())
    assert [c[1:] for c in got[1]] == [c[1:] for c in got[100]]


def test_dedup_accounting_algebra(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    acct = {
        r["chunk_hash"]: (r["chunk_len"], r["n_copies"], r["saved_bytes"])
        for r in cdc_dedup_accounting(df, MIN, NORMAL, MAX).collect()
    }
    # recompute from the reference
    from collections import Counter

    cnt, lens = Counter(), {}
    for _, text in docs:
        for off, ln, hx in ref_cdc_doc(text, MIN, NORMAL, MAX) or []:
            cnt[hx] += 1
            lens[hx] = ln
    exp = {
        h: (lens[h], c, (c - 1) * lens[h])
        for h, c in cnt.items()
        if c >= 2
    }
    assert acct == exp
    assert acct  # the dup structure guarantees shared chunks


def test_partitioning_and_batch_invariance(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, cdc_chunk_docs(df.repartition(1)).collect()))
    b = sorted(map(tuple, cdc_chunk_docs(df.repartition(7)).collect()))
    assert a == b


def test_single_doc_alone_equals_in_batch(spark):
    text = _mk_text(3)
    alone = _run_chunks(spark, [(1, text)])[1]
    batch = _run_chunks(spark, _corpus())[3]
    assert [c[1:] for c in alone] == [c[1:] for c in batch]


def test_multibyte_offsets_are_bytes(spark):
    text = "héllo wörld " * 40
    got = _run_chunks(spark, [(1, text)])[1]
    raw = text.encode("utf-8")
    assert sum(c[2] for c in got) == len(raw)
    for _, off, ln, hx in got:
        assert hashlib.md5(raw[off : off + ln]).hexdigest() == hx


def test_tiny_doc_single_chunk(spark):
    got = _run_chunks(spark, [(1, "tiny")])[1]
    assert len(got) == 1 and got[0][2] == 4


def test_bad_sizes_raise():
    with pytest.raises(ValueError, match="min <= normal <= max"):
        _cdc_chunks_udf(100, 50, 200)

"""The fused MinHash text kernel vs an independent per-row reference.

The kernel (operators/dedup.py::_minhash_text_udf) computes tokenize →
token hash → shingle chain → minhash → band hashes over flattened Arrow
buffers with reduceat segments; this reference walks one document at a
time with plain Python ints. Agreement across adversarial shapes pins the
segment/masking logic (row boundaries, empty docs, unicode, huge docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from warcsum_spark.operators.dedup import (
    _SM_GAMMA,
    _SM_GAMMA2,
    _minhash_text_udf,
    _splitmix,
)

G = np.uint64(_SM_GAMMA)
G2 = np.uint64(_SM_GAMMA2)


def _sm1(x: int) -> np.uint64:
    return _splitmix(np.uint64(x))


def ref_row(text, num_hashes, k, bands):
    if text is None:
        return None
    toks = text.strip().lower().split()
    if len(toks) < k:
        return None

    def tok_hash(t: str) -> np.uint64:
        bs = t.encode("utf-8")
        acc = np.uint64(0)
        for i, b in enumerate(bs):
            acc = acc + _sm1(np.uint64(b) ^ (np.uint64(i + 1)) * G2)
        return _sm1(acc ^ np.uint64(len(bs)) * G2)

    th = [tok_hash(t) for t in toks]
    shingles = []
    for s in range(len(toks) - k + 1):
        acc = _sm1(th[s])
        for j in range(1, k):
            acc = _sm1(acc ^ th[s + j])
        shingles.append(acc)
    sig = [
        min(_sm1(x ^ (np.uint64(i) * G + G)) for x in shingles)
        for i in range(num_hashes)
    ]
    rpb = num_hashes // bands
    bnd = []
    for j in range(bands):
        h = _sm1(np.uint64(j + 1) * G)
        for r in range(rpb):
            h = _sm1(h ^ sig[j * rpb + r])
        bnd.append(h)
    to_i64 = lambda v: int(np.int64(np.uint64(v)))  # noqa: E731
    return [to_i64(x) for x in sig], [to_i64(x) for x in bnd]


CASES = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one two",  # < k tokens → null
    "",  # empty → null
    None,  # null → null
    "  spaced   out\ttokens \n here okay ",
    "a b c",  # exactly k tokens → one shingle
    "x " * 500,  # repeated token — duplicate shingles
    "unicode éè café résumé ДОКУМЕНТ words here",
    "MiXeD CaSe TOKENS Should Lowercase First",
    "a" * 10_000 + " bb cc dd",  # one huge token
]


@pytest.mark.parametrize("num_hashes,k,bands", [(8, 3, 4), (64, 2, 16), (16, 5, 4)])
def test_kernel_matches_reference(num_hashes, k, bands):
    udf = _minhash_text_udf(num_hashes, k, bands)
    res = udf.func(pa.array(CASES, type=pa.string()))
    for i, text in enumerate(CASES):
        expect = ref_row(text, num_hashes, k, bands)
        got = res[i].as_py()
        if expect is None:
            assert got is None, (i, text, got)
        else:
            assert got is not None, (i, text)
            assert got["sig"] == expect[0], (i, text)
            assert got["bands"] == expect[1], (i, text)


def test_kernel_matches_reference_random_batch():
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "délta", "x", "longword" * 5, "99"]
    docs = []
    for _ in range(300):
        n = rng.randint(0, 12)
        docs.append(" ".join(rng.choice(words, n)) if n else "")
    udf = _minhash_text_udf(16, 3, 4)
    res = udf.func(pa.array(docs, type=pa.string()))
    for i, text in enumerate(docs):
        expect = ref_row(text, 16, 3, 4)
        got = res[i].as_py()
        if expect is None:
            assert got is None, (i, text)
        else:
            assert (got["sig"], got["bands"]) == expect, (i, text)


def test_kernel_bands_divide_check():
    with pytest.raises(ValueError):
        _minhash_text_udf(10, 3, 4)


@pytest.mark.parametrize(
    "tail", [[""], [None], ["", ""], ["ab"], ["   "], []]
)
def test_signatures_are_batch_composition_independent(tail):
    """Regression: an empty/whitespace/sub-k doc at the END of a batch must
    not change the preceding docs' signatures (the old reduceat index
    clamp truncated the previous token/row segment)."""
    docs = ["alpha beta gamma delta", "the quick brown fox"]
    udf = _minhash_text_udf(8, 3, 4)
    alone = [udf.func(pa.array(docs, type=pa.string()))[i].as_py() for i in range(2)]
    batched = udf.func(pa.array(docs + tail, type=pa.string()))
    for i in range(2):
        assert batched[i].as_py() == alone[i], (tail, i)
    for j in range(len(tail)):
        assert batched[2 + j].as_py() is None


def test_kernel_all_rows_degenerate():
    udf = _minhash_text_udf(8, 3, 4)
    res = udf.func(pa.array(["", None, " ", "a b"], type=pa.string()))
    assert all(res[i].as_py() is None for i in range(4))
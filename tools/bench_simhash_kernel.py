"""Microbench: boxed (per-row np.asarray) vs buffer-native simhash vote
and cosine kernels on a 1M-row Arrow batch — the numbers quoted in
operators/dedup.py::_simhash_votes_udf and similarity.py::cosine_batch.

Runs the raw kernel bodies outside Spark (the UDF wrapper adds only
Arrow IPC, identical for both forms). Usage: python tools/bench_simhash_kernel.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

N_ROWS = 1_000_000
TOKENS_PER_DOC = 20
DIM = 64


def boxed_simhash(th_list) -> np.ndarray:
    n = len(th_list)
    arrs = [np.asarray(a, dtype=np.int64) for a in th_list]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
    total = int(lens.sum())
    flat = np.concatenate(arrs).view(np.uint64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sig = np.zeros(n, dtype=np.uint64)
    ones_buf = np.zeros(total + 1, dtype=np.int64)
    for i in range(64):
        ones_buf[:total] = ((flat >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
        cnt = np.add.reduceat(ones_buf, offsets)[:n]
        sig |= ((2 * cnt - lens) > 0).astype(np.uint64) << np.uint64(i)
    return sig.view(np.int64)


def main() -> None:
    rng = np.random.RandomState(7)
    vals = rng.randint(-(2**62), 2**62, size=N_ROWS * TOKENS_PER_DOC, dtype=np.int64)
    offs = np.arange(0, (N_ROWS + 1) * TOKENS_PER_DOC, TOKENS_PER_DOC, dtype=np.int32)
    arr = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), pa.array(vals))

    from warcsum_spark.operators.dedup import _simhash_votes_udf

    kernel = _simhash_votes_udf.func  # unwrap the raw arrow kernel

    t0 = time.perf_counter()
    new_out = kernel(arr)
    t_new = time.perf_counter() - t0

    t0 = time.perf_counter()
    # the old pandas_udf received per-row objects: the arrow→python
    # conversion is part of the boxed form's cost
    old_out = boxed_simhash(arr.to_pylist())
    t_old = time.perf_counter() - t0

    assert np.array_equal(np.asarray(new_out), old_out)
    print(
        f"simhash votes, {N_ROWS} rows x {TOKENS_PER_DOC} tokens: "
        f"boxed {t_old:.3f}s, buffer-native {t_new:.3f}s, {t_old / t_new:.1f}x"
    )

    # cosine: 1M pairs at dim 64
    from warcsum_spark.operators.similarity import cosine_batch

    v = rng.randn(N_ROWS * DIM).astype(np.float32)
    offs2 = np.arange(0, (N_ROWS + 1) * DIM, DIM, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(offs2, type=pa.int32()), pa.array(v))
    ckernel = cosine_batch.func

    t0 = time.perf_counter()
    new_cos = ckernel(emb, emb)
    t_new = time.perf_counter() - t0

    t0 = time.perf_counter()
    A = np.stack([np.asarray(x, dtype=np.float64) for x in emb.to_pylist()])
    num = (A * A).sum(axis=1)
    den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((A * A).sum(axis=1))
    old_cos = num / den
    t_old = time.perf_counter() - t0

    assert np.allclose(np.asarray(new_cos), old_cos)
    print(
        f"cosine, {N_ROWS} pairs at dim {DIM}: "
        f"boxed {t_old:.3f}s, buffer-native {t_new:.3f}s, {t_old / t_new:.1f}x"
    )


if __name__ == "__main__":
    main()

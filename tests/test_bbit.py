"""operators/bbit.py (T115) — b-bit minwise hashing: an independent
Python twin built on oracle_refs.ref_minhash_doc (band join + mask +
collision correction row-at-a-time), the b=63 ≡ full-width equivalence,
identical-doc saturation, the clamp-at-zero floor, correction algebra
pins, parameter validation, and DuckDB twin parity over materialized
reference signatures."""

from __future__ import annotations

import itertools

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from warcsum_spark.operators.bbit import (
    bbit_minhash_duplicates,
    bbit_oracle_sql,
)
from warcsum_spark.operators.dedup import minhash_lsh_duplicates
from warcsum_spark.oracle_refs import ref_minhash_doc

NUM_HASHES, K, BANDS = 64, 3, 16


def _corpus():
    base = (
        "the quick brown fox jumps over the lazy dog and then naps "
        "under the old oak tree while birds sing"
    )
    near = base.replace("naps", "rests")  # one-token edit: high overlap
    docs = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, "completely different text about quantum chromodynamics "
            "lattice simulations and gauge field configurations today"),
        (5, "short"),  # < k tokens: no signature
    ]
    for i in range(6, 26):  # unrelated filler
        docs.append(
            (i, f"filler document number {i} with its own distinct "
                f"words like token{i} and value{i * 7} padding here")
        )
    return docs


def _py_ref(docs, b, threshold):
    sigs, bnds = {}, {}
    for d, t in docs:
        r = ref_minhash_doc(t, num_hashes=NUM_HASHES, k=K, bands=BANDS)
        if r is not None:
            sigs[d], bnds[d] = r
    mask = (1 << b) - 1
    c = 1.0 / (1 << b)
    out = {}
    for a, bb in itertools.combinations(sorted(sigs), 2):
        n_bands = int((bnds[a] == bnds[bb]).sum())
        if n_bands == 0:
            continue
        p_hat = float(
            ((sigs[a] & mask) == (sigs[bb] & mask)).sum()
        ) / NUM_HASHES
        est = round(max((p_hat - c) / (1 - c), 0.0), 6)
        if est >= threshold:
            out[(a, bb)] = (n_bands, est)
    return out


def _run(spark, docs, b, threshold):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = bbit_minhash_duplicates(
        df, k=K, num_hashes=NUM_HASHES, bands=BANDS, b=b,
        threshold=threshold,
    )
    return {
        (r["doc_a"], r["doc_b"]): (r["n_bands"], r["est_jaccard"])
        for r in res.collect()
    }


@pytest.mark.parametrize("b", [1, 2, 8])
def test_python_twin(spark, b):
    docs = _corpus()
    assert _run(spark, docs, b, 0.3) == _py_ref(docs, b, 0.3)


def test_b63_equals_full_width(spark):
    # 63 of 64 bits kept: collisions of masked values == collisions of
    # full values for splitmix-derived minima, and C=2^-63 vanishes
    # under round-6 — so the corrected estimate equals T1's est_jaccard
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_duplicates(
            df, k=K, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5
        ).collect()
    }
    got = {pair: est for pair, (_, est) in _run(spark, docs, 63, 0.5).items()}
    assert got == full


def test_exact_dup_saturates(spark):
    got = _run(spark, _corpus(), 2, 0.5)
    assert got[(1, 2)][1] == 1.0
    assert got[(1, 2)][0] == BANDS  # every band collides


def test_near_dup_survives_unrelated_does_not(spark):
    got = _run(spark, _corpus(), 2, 0.5)
    assert (1, 3) in got and (2, 3) in got
    assert not any(4 in pair for pair in got)


def test_clamp_floor_never_negative(spark):
    got = _run(spark, _corpus(), 1, 0.0)
    assert all(est >= 0.0 for _, est in got.values())


def test_correction_algebra():
    # P̂ at the collision floor maps to 0; P̂=1 maps to 1 — for every b
    for b in (1, 2, 4):
        c = 1.0 / (1 << b)
        assert round(max((c - c) / (1 - c), 0.0), 6) == 0.0
        assert round(max((1 - c) / (1 - c), 0.0), 6) == 1.0


def test_invalid_b_raises(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="b must be"):
        bbit_minhash_duplicates(df, b=0)
    with pytest.raises(ValueError, match="b must be"):
        bbit_minhash_duplicates(df, b=64)


def test_duckdb_twin_bit_parity(spark, tmp_path):
    docs = _corpus()
    sig_rows, band_rows = [], []
    for d, t in docs:
        r = ref_minhash_doc(t, num_hashes=NUM_HASHES, k=K, bands=BANDS)
        if r is None:
            continue
        sig, bnd = r
        sig_rows += [(d, i, int(v)) for i, v in enumerate(sig)]
        band_rows += [(d, i, int(v)) for i, v in enumerate(bnd)]
    sp = str(tmp_path / "sigs.parquet")
    bp = str(tmp_path / "bands.parquet")
    pq.write_table(
        pa.table(
            dict(zip(("doc_id", "pos", "sig_val"), zip(*sig_rows)))
        ),
        sp,
    )
    pq.write_table(
        pa.table(
            dict(zip(("doc_id", "band_id", "band_hash"), zip(*band_rows)))
        ),
        bp,
    )
    got = _run(spark, docs, 2, 0.3)
    rows = duckdb.connect().execute(
        bbit_oracle_sql(sp, bp, num_hashes=NUM_HASHES, b=2, threshold=0.3)
    ).fetchall()
    ref = {(a, b): (n, est) for a, b, n, est in rows}
    assert ref == got

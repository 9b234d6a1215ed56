"""operators/editdist.py (T118) — edit-distance verification of LSH
candidates: an independent Python twin (ref_minhash_doc band join +
Wagner–Fischer DP row-at-a-time), identical-doc zero pin, the
normalized-ratio gate at both extremes, the codepoint-vs-byte Unicode
contract, partitioning invariance, parameter validation, and DuckDB
twin parity over materialized reference signatures."""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from warcsum_spark.operators.editdist import (
    edit_verified_duplicates,
    edit_verified_oracle_sql,
)
from warcsum_spark.oracle_refs import ref_minhash_doc

NUM_HASHES, K, BANDS = 64, 3, 16


def _lev(a: str, b: str) -> int:
    """Wagner–Fischer over CODEPOINTS (Python str iteration) — the
    engine contract."""
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _corpus():
    base = (
        "the quick brown fox jumps over the lazy dog and then naps "
        "under the old oak tree while birds sing in the morning light"
    )
    docs = [
        (1, base),
        (2, base),  # exact dup of 1: distance 0
        (3, base.replace("naps", "rests")),  # near dup: small distance
        (4, base + " plus a freshly appended trailing clause here"),
        (5, "short"),  # < k tokens: no signature, never a candidate
        (6, "completely different text about quantum chromodynamics "
            "lattice simulations and gauge field configurations today"),
    ]
    # the motivating order-blind case: swapped halves share most word
    # shingles (LSH proposes) but the edit distance is huge (verify
    # disposes) — Jaccard alone would merge these
    half_x = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    half_y = "lambda mu nu xi omicron pi rho sigma tau upsilon "
    docs.append((27, half_x + half_y))
    docs.append((28, half_y + half_x))
    for i in range(7, 27):  # unrelated filler
        docs.append(
            (i, f"filler document number {i} with its own distinct "
                f"words like token{i} and value{i * 7} padding here")
        )
    return docs


def _py_ref(docs, max_ratio):
    sigs, bnds = {}, {}
    text = dict(docs)
    for d, t in docs:
        r = ref_minhash_doc(t, num_hashes=NUM_HASHES, k=K, bands=BANDS)
        if r is not None:
            sigs[d], bnds[d] = r
    out = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        n_bands = int((bnds[a] == bnds[b]).sum())
        if n_bands == 0:
            continue
        est = round(float((sigs[a] == sigs[b]).sum()) / NUM_HASHES, 6)
        dist = _lev(text[a], text[b])
        ratio = round(dist / max(len(text[a]), len(text[b]), 1), 6)
        if ratio <= max_ratio:
            out[(a, b)] = (n_bands, est, dist, ratio)
    return out


def _run(spark, docs, max_ratio):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = edit_verified_duplicates(
        df, k=K, num_hashes=NUM_HASHES, bands=BANDS, max_ratio=max_ratio
    )
    return {
        (r["doc_a"], r["doc_b"]): (
            r["n_bands"], r["est_jaccard"], r["edit_distance"], r["edit_ratio"]
        )
        for r in res.collect()
    }


@pytest.mark.parametrize("max_ratio", [1.0, 0.5, 0.0])
def test_python_twin(spark, max_ratio):
    docs = _corpus()
    got = _run(spark, docs, max_ratio)
    assert got == _py_ref(docs, max_ratio)
    if max_ratio == 1.0:
        # the corpus must actually exercise the tier: an exact pair,
        # a near pair, and at least one pair the 0.5 gate would drop
        assert got[(1, 2)][2] == 0 and got[(1, 2)][3] == 0.0
        assert 0 < got[(1, 3)][2] <= 5
        # the swapped-halves pair: high estimated Jaccard, huge ratio
        assert (27, 28) in got and got[(27, 28)][3] > 0.5
    if max_ratio == 0.5:
        assert (27, 28) not in got and (1, 2) in got


def test_zero_gate_keeps_only_exact(spark):
    got = _run(spark, _corpus(), 0.0)
    assert got and all(v[2] == 0 for v in got.values())
    assert (1, 2) in got


def test_unicode_codepoint_contract(spark):
    # one multibyte substitution: codepoint distance 1, byte distance 2
    # — the engine must count codepoints (the documented contract; the
    # SQL twin is only certified on the ASCII subset)
    t1 = " ".join(f"wört{i} zahl{i * 3}" for i in range(30)) + " ende"
    t2 = t1.replace(" ende", " önde")
    docs = [(1, t1), (2, t2)]
    got = _run(spark, docs, 1.0)
    assert got[(1, 2)][2] == _lev(t1, t2) == 1
    assert got[(1, 2)][3] == round(1 / max(len(t1), len(t2)), 6)


def test_short_docs_never_candidates(spark):
    got = _run(spark, _corpus(), 1.0)
    assert not any(5 in pair for pair in got)


def test_partitioning_invariance(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = edit_verified_duplicates(df, k=K, bands=BANDS, max_ratio=0.6)
    b = edit_verified_duplicates(
        df.repartition(7), k=K, bands=BANDS, max_ratio=0.6
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_max_ratio_validation(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    with pytest.raises(ValueError, match="max_ratio"):
        edit_verified_duplicates(df, max_ratio=1.5)


def test_duckdb_twin_parity(spark, tmp_path):
    docs = _corpus()
    ids, sig_rows, band_rows = [], [], []
    for d, t in docs:
        r = ref_minhash_doc(t, num_hashes=NUM_HASHES, k=K, bands=BANDS)
        if r is not None:
            ids.append(d)
            sig_rows.append(r[0])
            band_rows.append(r[1])
    n = len(ids)
    id_arr = np.asarray(ids, dtype=np.int64)
    sig_path = str(tmp_path / "sig.parquet")
    band_path = str(tmp_path / "bands.parquet")
    pq.write_table(
        pa.table({
            "doc_id": np.repeat(id_arr, NUM_HASHES),
            "pos": np.tile(np.arange(NUM_HASHES, dtype=np.int32), n),
            "sig_val": np.concatenate(sig_rows),
        }),
        sig_path,
    )
    pq.write_table(
        pa.table({
            "doc_id": np.repeat(id_arr, BANDS),
            "band_id": np.tile(np.arange(BANDS, dtype=np.int32), n),
            "band_hash": np.concatenate(band_rows),
        }),
        band_path,
    )
    corpus_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({d}, '{t}')" for d, t in docs
    ) + ") AS t(doc_id, text)"
    sql = edit_verified_oracle_sql(
        sig_path, band_path, corpus_sql, num_hashes=NUM_HASHES, max_ratio=0.6
    )
    ora = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in duckdb.sql(sql).fetchall()
    }
    assert _run(spark, docs, 0.6) == ora

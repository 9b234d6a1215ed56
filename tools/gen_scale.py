"""Deterministic scale-up of the driver's synthetic testdata.

Amplifies every table in an sf directory by an integer factor R with
per-replica transforms that preserve workload SHAPE instead of stamping
R identical copies:

* join/grouping keys become ``key*R + r`` consistently across tables, so
  every cross-table join keeps exactly its original fan-out (replica r
  of orders joins replica r of customer) and per-key group sizes stay
  constant while key cardinality grows R×;
* ``documents.text`` goes through a per-replica letter cipher
  (``translate`` with an affine permutation of the 26-letter lowercase
  alphabet: position i → a·i + b mod 26, a coprime to 26), so
  shingles/minhashes/simhashes of different replicas are genuinely
  different — naive duplication would put every document in an R-way
  near-dup cluster and blow the LSH candidate-pair stage up
  quadratically, benchmarking a different (and unrealistically
  adversarial) workload. 12 valid multipliers × 26 shifts = 312
  distinct ciphers, so the invariant holds to ×312 (the round-4
  10-letter rotation collapsed past ×10 — its ×100 attempt put ~10
  byte-identical copies of every doc in the corpus and died in an
  80 GB pair-stage spill; see BENCH/BASELINE.md forensics). Replica 0
  is the identity (a=1, b=0), keeping the base corpus verbatim.
  ``translate`` is length-preserving, so ``n_chars`` stays consistent
  with ``text``;
* embeddings are rotated by r positions — unit-norm-preserving, and
  rotations of a vector are far apart in cosine space, so ANN/near-dup
  candidate structure scales with the corpus instead of collapsing;
* timestamps, measures, and dimension tables (nation, region) are kept
  as-is: event streams get R× denser users, not a stretched clock.

Everything runs in DuckDB and lands as ONE parquet file per table named
exactly like the source (``documents.parquet`` …), so the scaled
directory is a drop-in ``sf_dir`` for ``__spark_entry__.queries()`` —
including the driver-side parquet-footer probes that require a real
file, not a Spark part-file directory.
"""

from __future__ import annotations

import os

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
#: multipliers coprime to 26 — with the 26 shifts, 312 distinct affine
#: permutations; replica r's cipher is unique for every factor ≤ 312
_A_VALS = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
MAX_FACTOR = len(_A_VALS) * len(_ALPHA)


def _cipher(r: int) -> str:
    """The translate() target string for replica ``r``: an affine
    permutation of _ALPHA (r=0 → identity, so replica 0 is the base
    corpus verbatim)."""
    a = _A_VALS[(r // len(_ALPHA)) % len(_A_VALS)]
    b = r % len(_ALPHA)
    n = len(_ALPHA)
    return "".join(_ALPHA[(a * i + b) % n] for i in range(n))


# per-table: (key columns that get *R+r, extra per-replica SQL overrides)
_TABLES: dict[str, tuple[list[str], dict[str, str]]] = {
    "documents": (
        ["doc_id"],
        {"text": "translate(text, '{a}', c.tgt)"},
    ),
    "embeddings": (
        ["vec_id"],
        {
            "embedding": (
                "CAST(list_concat(embedding[r.r + 1:{dim}],"
                " embedding[1:r.r]) AS FLOAT[])"
            )
        },
    ),
    "events": (["event_id", "user_id"], {}),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], {}),
    "orders": (["o_orderkey", "o_custkey"], {}),
    "customer": (["c_custkey"], {}),
    "part": (["p_partkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "nation": ([], {}),  # dimension: copied once, not amplified
    "region": ([], {}),
}


def generate_scaled(src_dir: str, out_dir: str, factor: int) -> str:
    """Write ``{out_dir}/{table}.parquet`` for every source table; no-op
    if the output already exists with the same factor (marker file)."""
    import duckdb

    if factor > MAX_FACTOR:
        raise ValueError(
            f"factor {factor} exceeds the {MAX_FACTOR} distinct replica "
            "ciphers — replicas would collide into byte-identical copies "
            "and the dedup candidate structure would degenerate"
        )
    # v2 marker: affine-cipher generator (v1 rotation dirs are stale data)
    marker = os.path.join(out_dir, f"_SCALED_v2_x{factor}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE ciphers(r INTEGER, tgt VARCHAR)")
    con.executemany(
        "INSERT INTO ciphers VALUES (?, ?)",
        [(r, _cipher(r)) for r in range(factor)],
    )
    for table, (keys, overrides) in _TABLES.items():
        src = os.path.join(src_dir, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        cols = [
            c[0]
            for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        if not keys:  # dimension table: verbatim copy
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        dim = 0
        if table == "embeddings":
            dim = con.sql(f"SELECT len(embedding) FROM '{src}' LIMIT 1").fetchone()[0]
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} * {factor} + r.r AS {c}")
            elif c in overrides:
                tmpl = overrides[c]
                exprs.append(
                    tmpl.format(a=_ALPHA, n=len(_ALPHA), dim=dim) + f" AS {c}"
                )
            else:
                exprs.append(c)
        join = (
            " LEFT JOIN ciphers c ON c.r = r.r" if table == "documents" else ""
        )
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM '{src}', range({factor}) r(r){join}) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    import sys

    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    generate_scaled(src, out, factor)
    print(out)

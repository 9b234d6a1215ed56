"""operators/imatch.py (T123) — I-Match: an independent Python twin,
both lexicon-band ends (rare-term and common-term edits collapse,
mid-band edits discriminate), the empty-filtered-set exclusion,
validation, partitioning invariance, and DuckDB twin parity."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from warcsum_spark.operators.imatch import (
    imatch_oracle_sql,
    imatch_signatures,
)


def _py_ref(docs, min_df=2, max_df_num=1, max_df_den=10):
    n = len(docs)
    term_sets = {
        d: {t for t in text.lower().strip().split() if t}
        for d, text in docs
    }
    df = {}
    for ts in term_sets.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    lex = {
        t
        for t, c in df.items()
        if c >= min_df and c * max_df_den <= n * max_df_num
    }
    sigs = {}
    for d, ts in term_sets.items():
        kept = sorted(ts & lex)
        if kept:
            sigs[d] = hashlib.sha256(" ".join(kept).encode()).hexdigest()
    groups = {}
    for d, s in sigs.items():
        groups.setdefault(s, []).append(d)
    out = {}
    for s, ds in groups.items():
        for d in ds:
            out[d] = (s, len(ds), min(ds), len(ds) >= 2)
    return out


def _corpus():
    # common filler present everywhere (above the df band at n=20);
    # ga/gb mid-band group tokens; zz<unique> rare tokens
    docs = []
    for i in range(20):
        docs.append(
            (
                i,
                f"common filler words everywhere ga{i % 3} gb{i % 4} zz{i}",
            )
        )
    return docs


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = imatch_signatures(df, **kw)
    return {r["doc_id"]: tuple(r)[1:] for r in res.collect()}


def test_python_twin(spark):
    docs = _corpus()
    got = _run(spark, docs, max_df_num=1, max_df_den=2)
    assert got == _py_ref(docs, max_df_num=1, max_df_den=2)
    # the mod-(3·4) collapse produces real multi-doc groups
    assert any(v[3] for v in got.values())


def test_rare_and_common_edits_collapse(spark):
    base = "alpha beta gamma shared anchor tokens here"
    docs = [
        (1, base + " midband"),
        (2, base + " midband zzunique2"),   # rare-end edit (df=1 dropped)
        (3, base + " midband pad"),         # common-end edit (pad is
                                            # ubiquitous below → dropped)
        (4, base + " different"),           # mid-band edit
        (5, base + " different zzunique5"),
    ] + [(10 + i, f"noise{i} filler pad") for i in range(6)]
    got = _run(spark, docs, min_df=2, max_df_num=1, max_df_den=2)
    # pad: df=7 of n=11 → above the band; midband df=3, different df=2
    # → both in band and discriminating
    assert got[1][0] == got[2][0] == got[3][0]
    assert got[1][1] >= 3 and got[1][3] is True and got[1][2] == 1
    # a mid-band substitution ('midband'→'different') discriminates
    assert got[4][0] != got[1][0]
    assert got[4][0] == got[5][0]


def test_empty_filtered_set_excluded(spark):
    # every term is either hapax or ubiquitous → nobody has a signature
    docs = [(i, f"common common2 common3 only{i}") for i in range(10)]
    assert _run(spark, docs, max_df_num=1, max_df_den=2) == {}


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_df"):
        imatch_signatures(df, min_df=0)
    with pytest.raises(ValueError, match="max_df"):
        imatch_signatures(df, max_df_den=0)


def test_partitioning_invariance(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        map(tuple, imatch_signatures(df, max_df_den=2).collect())
    )
    b = sorted(
        map(tuple, imatch_signatures(df.repartition(7), max_df_den=2).collect())
    )
    assert a == b


def test_duckdb_twin_parity(spark):
    docs = _corpus()
    docs_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({d}, '{t}')" for d, t in docs
    ) + ") AS t(doc_id, text)"
    sql = imatch_oracle_sql(docs_sql, max_df_num=1, max_df_den=2)
    ora = {r[0]: tuple(r)[1:] for r in duckdb.sql(sql).fetchall()}
    assert _run(spark, docs, max_df_num=1, max_df_den=2) == ora

"""operators/lm_score.py::moore_lewis (T112) — cross-entropy data
selection: consistency with T39's lm_perplexity (the in-domain side
IS that model), the all-reference degenerate pin (score exactly 0),
in-domain docs scoring below out-domain docs, threshold selection,
short-doc NULLs, partitioning invariance, and DuckDB twin parity."""

from __future__ import annotations

import pytest
import duckdb

from pyspark.sql import functions as F

from warcsum_spark.operators.lm_score import (
    lm_perplexity,
    moore_lewis,
    moore_lewis_sql,
)

# two "languages": A-ish docs share the a-vocabulary, B-ish the b-one
A_DOCS = [
    "alpha beta gamma alpha beta",
    "beta gamma alpha beta gamma alpha",
    "alpha alpha beta gamma beta",
]
B_DOCS = [
    "zeta eta theta zeta eta",
    "eta theta zeta eta theta zeta",
]


def _df(spark, extra=()):
    rows = [
        (i, t, "A") for i, t in enumerate(A_DOCS)
    ] + [(100 + i, t, "B") for i, t in enumerate(B_DOCS)]
    rows += list(extra)
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _run(spark, df, **kw):
    out = moore_lewis(
        df, F.col("lang") == "A", vocab_size=50, alpha=0.1, **kw
    ).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_in_domain_side_matches_lm_perplexity(spark):
    df = _df(spark)
    got = _run(spark, df)
    ref = {
        r["doc_id"]: r.asDict()
        for r in lm_perplexity(
            df, reference_pred=F.col("lang") == "A", vocab_size=50, alpha=0.1
        ).collect()
    }
    for d in got:
        assert got[d]["avg_logprob_in"] == pytest.approx(
            ref[d]["avg_logprob"], abs=2e-6
        ), d
        assert got[d]["n_bigrams"] == ref[d]["n_bigrams"]


def test_all_reference_degenerate_scores_zero(spark):
    df = _df(spark)
    out = moore_lewis(df, F.lit(True), vocab_size=50).collect()
    for r in out:
        assert r["ml_score"] == 0.0
        assert r["selected"] is True


def test_in_domain_docs_score_lower(spark):
    got = _run(spark, _df(spark))
    a_scores = [got[i]["ml_score"] for i in range(3)]
    b_scores = [got[100 + i]["ml_score"] for i in range(2)]
    assert max(a_scores) < min(b_scores)


def test_threshold_selects(spark):
    got = _run(spark, _df(spark))
    scores = sorted(v["ml_score"] for v in got.values())
    thr = scores[2]  # keep exactly the three lowest
    sel = _run(spark, _df(spark), threshold=thr)
    kept = [d for d, v in sel.items() if v["selected"]]
    assert len(kept) == 3
    assert all(sel[d]["ml_score"] <= thr for d in kept)


def test_short_docs_null_and_unselected(spark):
    got = _run(spark, _df(spark, extra=[(500, "single", "B"), (501, "", "B")]),
               threshold=100.0)
    for d in (500, 501):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["ml_score"] is None
        assert got[d]["selected"] is False
    assert got[0]["selected"] is True  # generous threshold keeps real docs


def test_partitioning_invariance(spark):
    df = _df(spark)
    a = sorted(
        map(tuple, moore_lewis(df.repartition(1), F.col("lang") == "A",
                               vocab_size=50).collect())
    )
    b = sorted(
        map(tuple, moore_lewis(df.repartition(7), F.col("lang") == "A",
                               vocab_size=50).collect())
    )
    assert a == b


def test_duckdb_twin_parity(spark):
    df = _df(spark, extra=[(500, "single", "B")])
    got = _run(spark, df, threshold=0.5)
    con = duckdb.connect()
    con.execute("CREATE TABLE D (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO D VALUES (?, ?, ?)",
        [(r["doc_id"], r["text"], r["lang"]) for r in df.collect()],
    )
    sql = moore_lewis_sql(
        r"""SELECT doc_id,
          trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t,
          lang = 'A' AS is_ref
        FROM D""",
        vocab_size=50,
        alpha=0.1,
        threshold=0.5,
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    fetched = cur.fetchall()
    assert len(fetched) == len(got)
    for r in fetched:
        d = dict(zip(cols, r))
        g = got[d["doc_id"]]
        for k, v in d.items():
            if isinstance(v, float):
                assert g[k] == pytest.approx(v, abs=2e-6), (d["doc_id"], k)
            else:
                assert g[k] == v, (d["doc_id"], k, g[k], v)

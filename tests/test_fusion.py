"""operators/fusion.py (T91) — reciprocal-rank fusion: a pure-Python
reference twin, overlap/one-sided membership, tie determinism, k
truncation, a 3-run pinned fold, DuckDB twin bit parity on literal
runs, and the dimension-sized plan contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.fusion import rrf_fuse, rrf_sql


def _py_ref(runs, k=10, k0=60):
    # runs: list of {(qid, did): rank}
    keys = set()
    for r in runs:
        keys |= set(r)
    fused = {}
    for key in keys:
        s = 0.0
        for r in runs:  # pinned left-to-right chain
            s = s + (1.0 / (k0 + r[key]) if key in r else 0.0)
        fused[key] = round(s, 6)
    out = {}
    byq = {}
    for (q, d), s in fused.items():
        byq.setdefault(q, []).append((d, s))
    for q, items in byq.items():
        items.sort(key=lambda ds: (-ds[1], ds[0]))
        for rank, (d, s) in enumerate(items[:k], start=1):
            out[(q, d)] = (s, rank)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, rank int"
    )


def test_python_reference_twin_two_runs(spark):
    lex = [(1, 10, 9.0, 1), (1, 11, 8.0, 2), (1, 12, 7.0, 3)]
    den = [(1, 11, 0.9, 1), (1, 13, 0.8, 2), (1, 10, 0.7, 3)]
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["fused_rank"])
        for r in rrf_fuse([_df(spark, lex), _df(spark, den)], k=10).collect()
    }
    ref = _py_ref(
        [
            {(q, d): r for q, d, _, r in lex},
            {(q, d): r for q, d, _, r in den},
        ]
    )
    assert got == ref
    # 11: in both runs (ranks 2,1) beats 10 (ranks 1,3)
    assert got[(1, 11)][1] == 1


def test_one_sided_membership_contributes_single_term(spark):
    lex = [(1, 10, 1.0, 1)]
    den = [(1, 20, 1.0, 1)]
    got = {
        r["doc_id"]: r
        for r in rrf_fuse([_df(spark, lex), _df(spark, den)]).collect()
    }
    assert got[10]["rrf_score"] == got[20]["rrf_score"] == round(1 / 61, 6)
    assert got[10]["rank_2"] is None and got[20]["rank_1"] is None
    # equal scores → doc_id ascending breaks the tie
    assert got[10]["fused_rank"] == 1 and got[20]["fused_rank"] == 2


def test_k_truncation(spark):
    lex = [(1, d, 1.0, d) for d in range(1, 9)]
    out = rrf_fuse([_df(spark, lex)], k=3).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]


def test_three_run_pinned_fold(spark):
    runs = [
        [(1, 10, 0.0, 1), (1, 11, 0.0, 2)],
        [(1, 11, 0.0, 1), (1, 12, 0.0, 2)],
        [(1, 12, 0.0, 1), (1, 10, 0.0, 2)],
    ]
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([_df(spark, r) for r in runs], k=10).collect()
    }
    ref = _py_ref([{(q, d): r for q, d, _, r in run} for run in runs])
    assert got == {d: s for (_, d), (s, _) in ref.items()}


def test_duckdb_twin_bit_parity(spark):
    lex = [(1, 10, 9.0, 1), (1, 11, 8.0, 2), (2, 10, 5.0, 1)]
    den = [(1, 11, 0.9, 1), (1, 12, 0.8, 2), (2, 13, 0.7, 1)]
    got = {
        (r["query_id"], r["doc_id"]): (
            r["rank_1"], r["rank_2"], r["rrf_score"], r["fused_rank"]
        )
        for r in rrf_fuse([_df(spark, lex), _df(spark, den)], k=10).collect()
    }

    def vals(rows):
        v = ", ".join(f"({q}, {d}, {r})" for q, d, _, r in rows)
        return f"SELECT * FROM (VALUES {v}) t(query_id, doc_id, rank)"

    sql = rrf_sql([(vals(lex), "doc_id"), (vals(den), "doc_id")], k=10)
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want  # bit parity


def test_end_to_end_hybrid_retrieval(spark):
    from warcsum_spark.operators.bm25 import bm25_search
    from warcsum_spark.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [
            (0, "spark joins data"),
            (1, "spark spark spark"),
            (2, "unrelated prose entirely"),
            (3, "cats and dogs"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (1, [0.9, 0.1]),
            (2, [0.0, 1.0]), (3, [0.1, 0.9]),
        ],
        "vec_id long, embedding array<float>",
    )
    lex = bm25_search(
        docs, spark.createDataFrame([(7, "spark")], "query_id long, term string"), k=3
    )
    qv = emb.filter("vec_id = 0").select(
        (emb.vec_id * 0 + 7).alias("query_id"), "embedding"
    )
    den = brute_force_topk(emb, qv, k=3)
    out = rrf_fuse([lex, den], k=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 1: top lexical AND 2nd dense → must be fused rank 1
    assert by_id[1]["fused_rank"] in (1, 2) and by_id[0]["fused_rank"] in (1, 2)
    # doc 3 only appears via the dense run
    assert by_id[3]["rank_1"] is None and by_id[3]["rank_2"] is not None


def test_plan_python_free(spark):
    lex = [(1, 10, 9.0, 1)]
    df = rrf_fuse([_df(spark, lex), _df(spark, lex)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_empty_runs_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])

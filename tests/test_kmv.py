"""operators/kmv.py (T94) — KMV overlap sketches: exact path below k,
estimator accuracy envelopes above k, the exact merge property,
partitioning invariance, DuckDB twin bit parity, and the Python-free
plan contract."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.kmv import kmv_overlap, kmv_overlap_sql, kmv_sketch


def _texts_df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _overlap(spark, a, b, k):
    return kmv_overlap(
        kmv_sketch(_texts_df(spark, a), k=k),
        kmv_sketch(_texts_df(spark, b), k=k),
        k=k,
    ).collect()[0].asDict()


def test_small_corpora_are_exact(spark):
    a = [f"doc {i}" for i in range(20)]
    b = [f"doc {i}" for i in range(10, 25)]  # overlap 10..19
    out = _overlap(spark, a, b, k=64)
    assert out["n_a"] == 20 and out["n_b"] == 15
    assert out["est_distinct_a"] == 20.0
    assert out["est_distinct_b"] == 15.0
    assert out["est_union"] == 25.0
    # below k the merged sketch IS the union: Jaccard exact
    assert out["jaccard"] == pytest.approx(10 / 25, abs=1e-6)
    assert out["est_intersection"] == 10
    assert out["containment_b_in_a"] == pytest.approx(10 / 15, abs=1e-6)


def test_estimator_accuracy_above_k(spark):
    n = 3000
    a = [f"page {i}" for i in range(n)]
    b = [f"page {i}" for i in range(n // 2, n + n // 2)]  # 50% overlap
    out = _overlap(spark, a, b, k=256)
    # (k-1)/v_k at k=256: ~±13% stderr; allow 3 sigma
    assert out["est_distinct_a"] == pytest.approx(n, rel=0.4)
    assert out["est_union"] == pytest.approx(1.5 * n, rel=0.4)
    assert out["jaccard"] == pytest.approx(1 / 3, abs=0.15)
    assert out["est_intersection"] == pytest.approx(n // 2, rel=0.6)


def test_merge_property_is_exact(spark):
    # k smallest of (sketch_a ∪ sketch_b) == sketch of (A ∪ B)
    a = [f"x{i}" for i in range(500)]
    b = [f"y{i}" for i in range(500)]
    k = 32
    sa = {r["h"] for r in kmv_sketch(_texts_df(spark, a), k=k).collect()}
    sb = {r["h"] for r in kmv_sketch(_texts_df(spark, b), k=k).collect()}
    su = {
        r["h"] for r in kmv_sketch(_texts_df(spark, a + b), k=k).collect()
    }
    assert set(sorted(sa | sb)[:k]) == su


def test_disjoint_and_identical_corpora(spark):
    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    out = _overlap(spark, a, b, k=64)
    assert out["jaccard"] == 0.0 and out["est_intersection"] == 0
    same = _overlap(spark, a, list(a), k=64)
    assert same["jaccard"] == 1.0
    assert same["containment_b_in_a"] == 1.0


def test_duplicates_collapse_before_sketching(spark):
    out = _overlap(spark, ["dup"] * 100 + ["x"], ["dup"], k=8)
    assert out["n_a"] == 2 and out["n_b"] == 1
    assert out["est_intersection"] == 1


def test_partitioning_invariance(spark):
    texts = [f"t{i}" for i in range(400)]
    df = _texts_df(spark, texts)
    k = 64
    a = sorted(
        r["h"] for r in kmv_sketch(df.repartition(1), k=k).collect()
    )
    b = sorted(
        r["h"] for r in kmv_sketch(df.repartition(17), k=k).collect()
    )
    assert a == b


def test_duckdb_twin_bit_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        kmv_overlap(
            kmv_sketch(docs.select("text"), k=32),
            kmv_sketch(docs.limit(300).select("text"), k=32),
            k=32,
        )
        .collect()[0]
        .asDict()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = kmv_overlap_sql(
        "SELECT text FROM documents",
        "SELECT text FROM (SELECT * FROM documents LIMIT 300)",
        k=32,
    )
    cur = con.execute(sql)
    want = dict(zip([d[0] for d in cur.description], cur.fetchall()[0]))
    assert got == want  # bit parity


def test_plan_python_free(spark):
    df = _texts_df(spark, ["a", "b"])
    plan = (
        kmv_overlap(kmv_sketch(df, k=4), kmv_sketch(df, k=4), k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

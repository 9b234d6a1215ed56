"""operators/cluster_agree.py (T127) — clustering agreement: an
independent Python pair-counting twin, hand-computed known values,
perfect/chance/trivial-degenerate pins, inner-join id semantics,
partitioning invariance, DuckDB twin parity, and the Python-free
plan contract."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from warcsum_spark.operators.cluster_agree import (
    cluster_agreement,
    cluster_agreement_oracle_sql,
)


def _py_ref(ref, cand):
    ids = set(dict(ref)) & set(dict(cand))
    la = {i: l for i, l in ref if i in ids}
    lb = {i: l for i, l in cand if i in ids}
    cont = Counter((la[i], lb[i]) for i in ids)
    n = len(ids)
    tp2 = sum(v * (v - 1) for v in cont.values())
    pa2 = sum(v * (v - 1) for v in Counter(la.values()).values())
    pb2 = sum(v * (v - 1) for v in Counter(lb.values()).values())
    total2 = n * (n - 1)
    fp2, fn2 = pb2 - tp2, pa2 - tp2
    tn2 = total2 - tp2 - fp2 - fn2

    def ratio(a, b):
        return round(a / b, 6) if b else None

    e2 = pa2 * pb2 / total2 if total2 else 0.0
    m2 = (pa2 + pb2) / 2.0
    ari = round((tp2 - e2) / (m2 - e2), 6) if total2 and m2 - e2 else None
    return (
        n, tp2 // 2, fp2 // 2, fn2 // 2, tn2 // 2,
        ratio(tp2, tp2 + fp2),
        ratio(tp2, tp2 + fn2),
        ratio(tp2 * 2, tp2 * 2 + fp2 + fn2),
        ratio(tp2 + tn2, total2),
        ari,
    )


def _run(spark, ref, cand):
    a = spark.createDataFrame(ref, "id long, label string")
    b = spark.createDataFrame(cand, "id long, label string")
    rows = cluster_agreement(a, b).collect()
    assert len(rows) == 1
    return tuple(rows[0])


REF = [(i, f"r{i % 3}") for i in range(12)]
CAND = [(i, f"c{i % 4}") for i in range(12)]


def test_python_twin(spark):
    assert _run(spark, REF, CAND) == _py_ref(REF, CAND)


def test_hand_computed_known_values(spark):
    # ref {1,2,3}{4,5}; cand {1,2}{3,4,5}: tp = C(2,2)+C(2,2) = 2,
    # pa = 3+1 = 4, pb = 1+3 = 4 → fp = 2, fn = 2, total = 10, tn = 4
    ref = [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y")]
    cand = [(1, "p"), (2, "p"), (3, "q"), (4, "q"), (5, "q")]
    n, tp, fp, fn, tn, prec, rec, f1, rand, ari = _run(spark, ref, cand)
    assert (n, tp, fp, fn, tn) == (5, 2, 2, 2, 4)
    assert prec == rec == f1 == 0.5
    assert rand == 0.6
    # ARI by the Hubert–Arabie form: (2 − 16/10)/(4 − 16/10) = 1/6
    assert ari == round((2 - 1.6) / (4 - 1.6), 6)


def test_perfect_agreement(spark):
    ref = [(i, f"g{i % 4}") for i in range(20)]
    cand = [(i, f"h{i % 4}") for i in range(20)]  # same partition, renamed
    n, tp, fp, fn, tn, prec, rec, f1, rand, ari = _run(spark, ref, cand)
    assert fp == fn == 0
    assert prec == rec == f1 == rand == ari == 1.0


def test_trivial_clusterings_null_ari(spark):
    # both sides all-in-one: chance model degenerates → ARI NULL, but
    # precision/recall/rand are still 1 (every pair agrees)
    ref = [(i, "all") for i in range(6)]
    cand = [(i, "one") for i in range(6)]
    n, tp, fp, fn, tn, prec, rec, f1, rand, ari = _run(spark, ref, cand)
    assert (tp, fp, fn, tn) == (15, 0, 0, 0)
    assert prec == rec == f1 == rand == 1.0 and ari is None


def test_inner_join_id_semantics(spark):
    # ids 10..14 exist only in ref, 20..24 only in cand → dropped
    ref = REF + [(100 + i, "solo") for i in range(5)]
    cand = CAND + [(200 + i, "solo") for i in range(5)]
    assert _run(spark, ref, cand) == _py_ref(REF, CAND)


def test_partitioning_invariance(spark):
    a = spark.createDataFrame(REF, "id long, label string")
    b = spark.createDataFrame(CAND, "id long, label string")
    x = tuple(cluster_agreement(a, b).collect()[0])
    y = tuple(
        cluster_agreement(a.repartition(7), b.repartition(5)).collect()[0]
    )
    assert x == y


def test_duckdb_twin_parity(spark):
    def vals(rows):
        return "SELECT * FROM (VALUES " + ", ".join(
            f"({i}, '{l}')" for i, l in rows
        ) + ") AS t(id, label)"

    sql = cluster_agreement_oracle_sql(vals(REF), vals(CAND))
    ora = tuple(duckdb.sql(sql).fetchall()[0])
    assert _run(spark, REF, CAND) == ora


def test_plan_is_python_free(spark):
    a = spark.createDataFrame(REF, "id long, label string")
    b = spark.createDataFrame(CAND, "id long, label string")
    plan = (
        cluster_agreement(a, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

"""operators/domain_gate.py — domain-level quality gating: verdict
arithmetic vs a Python twin, the small-domain default policy, null
verdicts, composition with the T13 rule battery, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.domain_gate import (
    domain_quality_gate,
    domain_quality_stats,
)

ROWS = [
    # good.example: 5 docs, 4 pass
    *[(i, "good.example", i < 4) for i in range(5)],
    # bad.example: 6 docs, 1 passes
    *[(10 + i, "bad.example", i == 0) for i in range(6)],
    # tiny.example: 2 docs (below min_docs), both fail
    (20, "tiny.example", False),
    (21, "tiny.example", False),
    # nulls.example: verdicts partly null (count as failures)
    (30, "nulls.example", None),
    (31, "nulls.example", True),
    (32, "nulls.example", True),
    (33, "nulls.example", True),
    (34, "nulls.example", None),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, source string, ok boolean"
    )


def test_stats_and_verdicts(spark):
    out = domain_quality_gate(
        _df(spark), "ok", min_docs=5, min_pass_frac=0.5
    )
    by = {r["source"]: r for r in out.collect()}
    assert by["good.example"]["domain_pass_frac"] == 0.8
    assert by["good.example"]["domain_kept"] is True
    assert by["bad.example"]["domain_pass_frac"] == round(1 / 6, 6)
    assert by["bad.example"]["domain_kept"] is False
    # nulls count as failures: 3/5 = 0.6 >= 0.5
    assert by["nulls.example"]["domain_pass_frac"] == 0.6
    assert by["nulls.example"]["domain_kept"] is True
    assert out.count() == len(ROWS)  # every doc annotated, none dropped


def test_small_domain_default_policy(spark):
    df = _df(spark)
    keep = domain_quality_gate(df, "ok", min_docs=5, default_keep=True)
    drop = domain_quality_gate(df, "ok", min_docs=5, default_keep=False)
    k = {r["source"]: r["domain_kept"] for r in keep.collect()}
    d = {r["source"]: r["domain_kept"] for r in drop.collect()}
    assert k["tiny.example"] is True and d["tiny.example"] is False
    # judged domains are unaffected by the default
    assert k["bad.example"] is d["bad.example"] is False


def test_expression_pass_col_and_battery_composition(spark):
    # a Column expression verdict, and the T13 battery's composite keep
    from warcsum_spark.functions.quality import with_quality_rules

    docs = spark.createDataFrame(
        [(1, "a.example", "word " * 60), (2, "a.example", "short"),
         (3, "b.example", "x")],
        "doc_id long, source string, text string",
    )
    expr_gate = domain_quality_gate(
        docs, F.length("text") > 10, min_docs=1, min_pass_frac=0.5
    )
    assert {r["source"]: r["domain_kept"] for r in expr_gate.collect()} == {
        "a.example": True,
        "b.example": False,
    }
    battery = with_quality_rules(docs)
    out = domain_quality_gate(battery, "keep", min_docs=1, min_pass_frac=0.5)
    assert out.count() == 3  # composes without column clashes


def test_plan_broadcasts_domain_table(spark):
    plan = (
        domain_quality_gate(_df(spark), "ok")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

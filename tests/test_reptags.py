"""functions/reptags.py (T80) — REP meta-tag / X-Robots-Tag opt-out
gating: both meta attribute orders, quoting/case variants, the ``none``
shorthand, agent scoping of header rules, null inputs, the composed
``train_eligible`` / ``follow_links`` gates, and a Python-free plan."""

from __future__ import annotations

from warcsum_spark.functions.reptags import DIRECTIVES, gate_optouts

SCHEMA = "doc_id long, html string, x_robots_tag string"


def _run(spark, rows, **kw):
    df = gate_optouts(spark.createDataFrame(rows, SCHEMA), **kw)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_meta_both_attribute_orders_and_quoting(spark):
    rows = [
        (1, '<meta name="robots" content="noindex, nofollow">', None),
        (2, '<meta content="noai" name=ROBOTS >', None),
        (3, "<META NAME='robots' CONTENT='noarchive'>", None),
        (4, '<meta name="viewport" content="width=1">', None),
    ]
    out = _run(spark, rows)
    assert out[1]["noindex"] and out[1]["nofollow"]
    assert not out[1]["train_eligible"] and not out[1]["follow_links"]
    assert out[2]["noai"] and not out[2]["train_eligible"]
    assert out[3]["noarchive"] and out[3]["train_eligible"]
    # a non-robots meta contributes nothing
    assert out[4]["train_eligible"] and out[4]["follow_links"]
    assert not any(out[4][d] for d in DIRECTIVES)


def test_none_shorthand_implies_noindex_and_nofollow(spark):
    out = _run(spark, [(1, '<meta name="robots" content="none">', None)])
    assert out[1]["noindex"] and out[1]["nofollow"]
    assert not out[1]["noarchive"]  # none is not "everything"
    assert not out[1]["train_eligible"] and not out[1]["follow_links"]


def test_header_agent_scoping(spark):
    rows = [
        (1, "<p></p>", "noindex"),              # unscoped: applies
        (2, "<p></p>", "otherbot: noindex"),    # foreign agent: ignored
        (3, "<p></p>", "mybot: noai, noindex"), # ours: both apply
        (4, "<p></p>", "MyBot:   nosnippet"),   # agent match is ci
    ]
    out = _run(spark, rows, agent="mybot")
    assert not out[1]["train_eligible"]
    assert out[2]["train_eligible"] and not out[2]["noindex"]
    assert out[3]["noai"] and out[3]["noindex"]
    assert out[4]["nosnippet"] and out[4]["train_eligible"]


def test_agent_specific_meta_tag(spark):
    rows = [
        (1, '<meta name="mybot" content="noindex">', None),
        (2, '<meta name="otherbot" content="noindex">', None),
    ]
    out = _run(spark, rows, agent="mybot")
    assert not out[1]["train_eligible"]
    assert out[2]["train_eligible"]


def test_meta_and_header_union(spark):
    out = _run(
        spark,
        [(1, '<meta name="robots" content="nofollow">', "noai")],
    )
    assert out[1]["nofollow"] and out[1]["noai"]
    assert not out[1]["train_eligible"] and not out[1]["follow_links"]


def test_null_inputs_are_unrestricted(spark):
    out = _run(spark, [(1, None, None), (2, "", "")])
    for i in (1, 2):
        assert out[i]["train_eligible"] and out[i]["follow_links"]
        assert not any(out[i][d] for d in DIRECTIVES)


def test_multiple_tags_accumulate(spark):
    html = (
        '<meta name="robots" content="noarchive">'
        "<p>body</p>"
        '<meta content="nosnippet , noimageai" name="robots">'
    )
    out = _run(spark, [(1, html, None)])
    assert out[1]["noarchive"] and out[1]["nosnippet"] and out[1]["noimageai"]
    assert out[1]["train_eligible"]


def test_plan_is_python_free(spark):
    df = gate_optouts(
        spark.createDataFrame([(1, "<p></p>", None)], SCHEMA)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan

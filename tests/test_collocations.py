"""operators/collocations.py (T83) — PMI collocation mining: pair
counts with the doc-final NULL marker, unigram recovery from the pair
table, hand-computed PMI values, support filtering, deterministic
ranking, and the no-Python / no-cartesian plan contract."""

from __future__ import annotations

import math

from warcsum_spark.operators.collocations import pair_counts, pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_pair_counts_with_final_marker(spark):
    pc = {
        (r["w1"], r["w2"]): r["c"]
        for r in pair_counts(_docs(spark, ["a b a b a b", "a b c"])).collect()
    }
    # adjacent pairs within docs; each doc's final token rides as (w, NULL)
    assert pc[("a", "b")] == 4
    assert pc[("b", "a")] == 2
    assert pc[("b", "c")] == 1
    assert pc[("b", None)] == 1 and pc[("c", None)] == 1
    # unigram counts are recoverable: sum of c over w1 == token count
    assert sum(pc.values()) == 9


def test_pmi_values_hand_computed(spark):
    out = pmi_collocations(
        _docs(spark, ["a b a b a b", "a b c"]), k=10, min_count=1
    ).collect()
    rows = {(r["w1"], r["w2"]): r for r in out}
    # n_tok = 9, n_bi = 7; c(a)=4, c(b)=4, c(c)=1
    ab = rows[("a", "b")]
    assert ab["c_xy"] == 4 and ab["c_x"] == 4 and ab["c_y"] == 4
    assert ab["pmi"] == round(math.log(((4 * 9) * 9) / ((7 * 4) * 4)), 6)
    bc = rows[("b", "c")]
    assert bc["pmi"] == round(math.log(((1 * 9) * 9) / ((7 * 4) * 1)), 6)
    # ranking: pmi desc, then lexicographic
    ranked = sorted(out, key=lambda r: r["rank"])
    pmis = [r["pmi"] for r in ranked]
    assert pmis == sorted(pmis, reverse=True)
    assert ranked[0]["rank"] == 1


def test_min_count_filters_support(spark):
    out = pmi_collocations(
        _docs(spark, ["a b a b a b", "a b c"]), k=10, min_count=2
    ).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("b", "c") not in pairs and ("a", "b") in pairs


def test_empty_and_single_word_docs(spark):
    out = pmi_collocations(
        _docs(spark, ["", "   ", "solo", "x y x y"]), k=10, min_count=2
    ).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}
    # solo contributes to n_tok but forms no bigram
    r = out[0]
    assert r["c_x"] == 2 and r["c_y"] == 2 and r["c_xy"] == 2


def test_k_limit_and_tie_order(spark):
    # four pairs, all count 1 over distinct vocab -> identical pmi;
    # ties must break lexicographically and k must bound the output
    out = pmi_collocations(
        _docs(spark, ["p q", "r s", "t u", "v w"]), k=3, min_count=1
    ).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert [(r["w1"], r["w2"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        ("p", "q"),
        ("r", "s"),
        ("t", "u"),
    ]


def test_plan_no_python_no_cartesian(spark):
    df = pmi_collocations(_docs(spark, ["a b a b"]), k=5, min_count=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    assert "CartesianProduct" not in plan

"""operators/spotsigs.py (T124) — SpotSigs: an independent Python
twin of the whole chain-extraction + multiset-Jaccard pipeline, the
boilerplate-blindness headline claim, multiset counting, the
end-of-document chain drop, the length-ratio prune, validation,
partitioning invariance, DuckDB twin parity, and the Python-free
plan contract."""

from __future__ import annotations

import re

import duckdb
import pytest

from warcsum_spark.operators.spotsigs import (
    DEFAULT_ANTECEDENTS,
    spotsig_bags,
    spotsig_duplicates,
    spotsigs_oracle_sql,
)

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_bags(docs, ants=DEFAULT_ANTECEDENTS, c=2):
    out = {}
    aset = set(ants)
    for d, text in docs:
        toks = [t for t in WS.split((text or "").lower().strip()) if t]
        bag = {}
        for i, t in enumerate(toks):
            if t in aset:
                chain = [x for x in toks[i + 1:] if x not in aset][:c]
                if chain:
                    sig = t + ":" + "-".join(chain)
                    bag[sig] = bag.get(sig, 0) + 1
        if bag:
            out[d] = bag
    return out


def _py_pairs(docs, ants=DEFAULT_ANTECEDENTS, c=2, num=44, den=100):
    bags = _py_bags(docs, ants, c)
    sizes = {d: sum(b.values()) for d, b in bags.items()}
    ids = sorted(bags)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = sum(
                min(bags[a][s], bags[b][s]) for s in bags[a] if s in bags[b]
            )
            if inter == 0:
                continue  # engine only proposes pairs sharing a signature
            sa, sb = sizes[a], sizes[b]
            if min(sa, sb) * den < num * max(sa, sb):
                continue  # the paper's length-ratio prune
            union = sa + sb - inter
            out[(a, b)] = (
                sa, sb, inter,
                round(inter / union, 6),
                inter * den >= num * union,
            )
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = spotsig_duplicates(df, **kw)
    return {(r["doc_a"], r["doc_b"]): tuple(r)[2:] for r in res.collect()}


CHROME_A = "home products pricing contact copyright 2024 acme corp"
CHROME_B = "login signup blog careers privacy terms sitemap rss feed"
BODY = (
    "the quick brown fox jumped over a lazy dog and the dog was not"
    " amused because there was a second fox in the garden"
)


def _corpus():
    return [
        (1, CHROME_A + " " + BODY),
        (2, CHROME_B + " " + BODY),                # same body, other chrome
        (3, CHROME_A + " " + BODY.replace("fox", "cat")),  # body edited
        (4, CHROME_A + " totally unrelated content with a story about the"
            " weather and the sea"),
        (5, "no anchors here just plain words"),  # zero antecedents →
        # no signatures at all; must appear in no pair
    ]


def test_python_twin(spark):
    docs = _corpus()
    assert _run(spark, docs) == _py_pairs(docs)


def test_boilerplate_blindness(spark):
    got = _run(spark, _corpus())
    # identical body under different chrome: chrome has no antecedents,
    # so the signature bags coincide exactly → sim 1.0, dup
    assert got[(1, 2)][3] == 1.0 and got[(1, 2)][4] is True
    # a body edit (fox→cat) perturbs only the chains through 'fox'
    assert (1, 3) in got and got[(1, 3)][3] < 1.0


def test_multiset_counting(spark):
    # the SAME signature occurs twice in doc 1, once in doc 2:
    # multiset min = 1, NOT the set-semantics 2
    docs = [(1, "the x y the x y"), (2, "the x y")]
    got = _run(spark, docs)
    (sa, sb, inter, sim, dup) = got[(1, 2)]
    assert (sa, sb, inter) == (2, 1, 1) and sim == round(1 / 2, 6)


def test_end_of_doc_chain_dropped(spark):
    docs = [(1, "word the"), (2, "the is a")]  # every chain empty
    assert _py_bags(docs) == {}
    assert _run(spark, docs) == {}


def test_length_ratio_prune(spark):
    # doc 2's bag is 10× doc 1's: min/max = 0.1 < τ=0.44 → pruned even
    # though they share a signature
    docs = [
        (1, "the alpha beta"),
        (2, "the alpha beta " + " ".join(f"the w{i} v{i}" for i in range(9))),
    ]
    ref = _py_pairs(docs)
    got = _run(spark, docs)
    assert got == ref and (1, 2) not in got


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "the a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chain_len"):
        spotsig_duplicates(df, chain_len=0)
    with pytest.raises(ValueError, match="antecedents"):
        spotsig_bags(df, antecedents=())
    with pytest.raises(ValueError, match="tau"):
        spotsig_duplicates(df, tau_den=0)


def test_partitioning_invariance(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, spotsig_duplicates(df).collect()))
    b = sorted(map(tuple, spotsig_duplicates(df.repartition(7)).collect()))
    assert a == b


def test_duckdb_twin_parity(spark):
    docs = _corpus()
    docs_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({d}, '{t}')" for d, t in docs
    ) + ") AS t(doc_id, text)"
    ora = {
        (r[0], r[1]): tuple(r)[2:]
        for r in duckdb.sql(spotsigs_oracle_sql(docs_sql)).fetchall()
    }
    assert _run(spark, docs) == ora


def test_plan_is_python_free(spark):
    df = spark.createDataFrame(
        [(1, "the a b"), (2, "the a b c")], "doc_id long, text string"
    )
    plan = (
        spotsig_duplicates(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan

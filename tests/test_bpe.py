"""T51 distributed BPE merge learning: trajectory equality with the
independent dict-based reference, stop conditions, encode==fold-replay,
and the all-JVM learning-loop plan contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.bpe import (
    _merge_fold,
    encode_words,
    learn_bpe,
    word_type_table,
)
from warcsum_spark.oracle_refs import ref_bpe_merges


def _learn(spark, texts, n, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = learn_bpe(df, n, **kw).collect()
    return [(r.rank, r.left, r.right, r.pair_count) for r in rows]


CORPORA = {
    "sennrich": ["low lower lowest low low", "new newer newest new"],
    "repeats": ["a aa aaa aaaa", "ab abab ababab", "b bb"],
    "nulls_and_empty": ["alpha beta alpha beta gamma", None, "", "   ", "beta"],
    "single_chars": ["x y z x y z x y"],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_matches_reference(spark, name):
    texts = CORPORA[name]
    assert _learn(spark, texts, 12) == ref_bpe_merges(texts, 12)


def test_random_corpus_matches_reference(spark):
    rng = random.Random(51)
    words = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
             for _ in range(25)]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
             for _ in range(30)]
    assert _learn(spark, texts, 20) == ref_bpe_merges(texts, 20)


def test_min_count_stop_and_exhaustion(spark):
    # every word unique, single occurrence: best pair count is 1 < 2
    texts = ["qwe rty uio"]
    assert _learn(spark, texts, 10) == []
    assert _learn(spark, texts, 10, min_count=1) == ref_bpe_merges(
        texts, 10, min_count=1
    )
    # tiny corpus exhausts before n_merges; ranks stay 1..len
    got = _learn(spark, ["zz zz zz"], 50)
    assert got == ref_bpe_merges(["zz zz zz"], 50)
    assert [m[0] for m in got] == list(range(1, len(got) + 1))


def test_empty_corpus_schema(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    out = learn_bpe(df, 5)
    assert out.columns == ["rank", "left", "right", "pair_count"]
    assert out.count() == 0


def test_encode_equals_fold_replay(spark):
    texts = CORPORA["sennrich"] + CORPORA["repeats"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [(l, r) for _, l, r, _ in _learn(spark, texts, 15)]
    wt = word_type_table(df)
    # replay every merge in rank order with the pure-JVM fold
    replay = wt
    col = F.col("syms")
    for l, r in merges:
        col = _merge_fold(col, l, r)
    replay = {r.word: r.syms for r in wt.withColumn("syms", col).collect()}
    enc = {
        r.word: r.subwords
        for r in encode_words(wt, merges).collect()
    }
    assert enc == replay
    assert enc["lowest"] != list("lowest")  # merges actually applied


def test_learning_loop_is_all_jvm(spark):
    """The per-round pair-count plan must contain no Python stages —
    fold, pair explode, and aggregation are all Catalyst expressions."""
    from warcsum_spark.operators.bpe import _adjacent_pairs

    df = spark.createDataFrame([(1, "ab ab abc")], "doc_id int, text string")
    types = word_type_table(df)
    counts = (
        types.select("count", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("count"))
    )
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    merged = types.withColumn("syms", _merge_fold(F.col("syms"), "a", "b"))
    assert "Python" not in merged._jdf.queryExecution().executedPlan().toString()


# ---- T87: corpus encode (encode_corpus + generated DuckDB twin) ----

_ENC_MERGES = [
    ("r", "o"), ("ro", "w</w>"), ("h", "a"), ("s", "h</w>"),
    ("ha", "sh</w>"), ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"),
    ("i", "n</w>"), ("o", "in</w>"), ("j", "oin</w>"), ("t", "a"),
    ("ta", "b"), ("l", "e</w>"), ("tab", "le</w>"), ("e", "r"),
]


def _py_encode(word, merges):
    from warcsum_spark.operators.bpe import END

    syms = [*word[:-1], word[-1] + END] if word else []
    ranks = {p: i for i, p in enumerate(merges)}
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        l, r_ = merges[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r_:
                out.append(l + r_)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_ENC_DOCS = [
    (1, "row hash scan join table order a"),
    (2, "hash hash table scanner"),
    (3, "   "),  # no words: zero counts, row still present
    (4, "Rorow TAB le er aan"),  # lowercase contract
]


def _enc_expected():
    out = {}
    for i, t in _ENC_DOCS:
        ws = [w for w in t.lower().strip().split() if w]
        toks = [s for w in ws for s in _py_encode(w, _ENC_MERGES)]
        out[i] = (len(ws), len(toks), len(set(toks)))
    return out


def test_encode_corpus_matches_python_reference(spark):
    from warcsum_spark.operators.bpe import encode_corpus

    df = spark.createDataFrame(_ENC_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_tokens"],
            r["n_distinct_subwords"],
        )
        for r in encode_corpus(df, _ENC_MERGES).collect()
    }
    assert got == _enc_expected()


def test_encode_corpus_duckdb_twin(spark):
    import pytest as _pytest

    duckdb = _pytest.importorskip("duckdb")
    from warcsum_spark.operators.bpe import bpe_encode_sql

    vals = ", ".join(f"({i}, '{t}')" for i, t in _ENC_DOCS)
    sql = bpe_encode_sql(
        f"src(doc_id, text) AS (VALUES {vals})", _ENC_MERGES
    )
    got = {r[0]: r[1:] for r in duckdb.sql(sql).fetchall()}
    assert got == _enc_expected()


def test_encode_corpus_with_learned_table(spark):
    """End-to-end consistency: a merge table LEARNED by learn_bpe is
    well-formed by construction, so the Arrow lowest-rank-first loop,
    the pure-Python reference, and the rank-order DuckDB replay agree
    on a corpus the fixture didn't hand-pick."""
    import pytest as _pytest

    duckdb = _pytest.importorskip("duckdb")
    from warcsum_spark.operators.bpe import (
        bpe_encode_sql,
        encode_corpus,
        learn_bpe,
    )

    docs = [
        (i, " ".join(["scan", "hash", "row", "table", "join"][j % 5]
                     for j in range(i, i + 6)))
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe(df, n_merges=8).orderBy("rank").collect()
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_distinct_subwords"])
        for r in encode_corpus(df, merges).collect()
    }
    vals = ", ".join(f"({i}, '{t}')" for i, t in docs)
    sql = bpe_encode_sql(f"src(doc_id, text) AS (VALUES {vals})", merges)
    oracle = {r[0]: r[1:] for r in duckdb.sql(sql).fetchall()}
    assert got == oracle
    exp = {}
    for i, t in docs:
        ws = t.split()
        toks = [s for w in ws for s in _py_encode(w, merges)]
        exp[i] = (len(ws), len(toks), len(set(toks)))
    assert got == exp

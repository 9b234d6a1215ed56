"""functions/readability.py (T89) — Flesch/FK/fog battery: a
pure-Python reference twin, hand-computed pins, the silent-e rule,
wordless docs, DuckDB-oracle bit parity, and the zero-exchange /
Python-free plan contract."""

from __future__ import annotations

import re

import duckdb
import pytest

from warcsum_spark.functions.readability import readability, readability_sql


def _py_syl(w: str) -> int:
    runs = len(re.findall(r"[aeiouy]+", w))
    if w.endswith("e") and runs >= 2:
        runs -= 1
    return max(1, runs)


def _py_ref(text: str) -> dict:
    raw = text or ""
    norm = re.sub(r"^ +| +$", "", re.sub(r"[^a-z]+", " ", raw.lower()))
    words = norm.split(" ") if norm else []
    n_sent = sum(raw.count(c) for c in ".!?")
    syls = [_py_syl(w) for w in words]
    out = {
        "n_words": len(words),
        "n_sentences": n_sent,
        "n_syllables": sum(syls),
        "n_complex_words": sum(1 for s in syls if s >= 3),
    }
    if words:
        wps = len(words) / max(1, n_sent)
        spw = sum(syls) / len(words)
        cpw = out["n_complex_words"] / len(words)
        out["flesch_reading_ease"] = round(
            206.835 - (1.015 * wps) - (84.6 * spw), 6
        )
        out["fk_grade"] = round(((0.39 * wps) + (11.8 * spw)) - 15.59, 6)
        out["gunning_fog"] = round(0.4 * (wps + (100.0 * cpw)), 6)
    else:
        out["flesch_reading_ease"] = None
        out["fk_grade"] = None
        out["gunning_fog"] = None
    return out


def _run(spark, rows):
    df = readability(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_hand_pinned_example(spark):
    # "the cat sat on the mat." — 6 one-syllable words, 1 sentence
    out = _run(spark, [(1, "the cat sat on the mat.")])
    r = out[1]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 1
    assert r["n_syllables"] == 6
    assert r["n_complex_words"] == 0
    # fre = 206.835 - 1.015*6 - 84.6*1 = 116.145
    assert r["flesch_reading_ease"] == pytest.approx(116.145, abs=1e-6)


def test_silent_e_and_complex_words(spark):
    # "sentence" → runs: e, e, e = 3, ends in e → 2 syllables
    # "knowledge" → o, e, e = 3 runs, silent e → 2
    # "university" → u,i,e,i,y = 5 runs → 5 syllables (complex)
    out = _run(spark, [(1, "sentence knowledge university")])
    r = out[1]
    assert r["n_syllables"] == 2 + 2 + 5
    assert r["n_complex_words"] == 1


def test_single_run_word_keeps_its_syllable(spark):
    # "the" ends in e but has ONE vowel run — silent-e must not fire
    out = _run(spark, [(1, "the")])
    assert out[1]["n_syllables"] == 1


def test_wordless_doc_scores_null(spark):
    out = _run(spark, [(1, "12345 !!! ..."), (2, ""), (3, None)])
    for i in (1, 2, 3):
        assert out[i]["n_words"] == 0
        assert out[i]["flesch_reading_ease"] is None
        assert out[i]["fk_grade"] is None
        assert out[i]["gunning_fog"] is None
    assert out[1]["n_sentences"] == 6  # counts survive: 3 dots + 3 bangs


def test_python_reference_twin(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog. It barked!",
        "Readability formulae are approximations; they remain useful.",
        "one",
        "A? B! C. D",
        "queueing yyy eye aeiouy",
        "  leading and trailing   spaces  here. ",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    out = _run(spark, rows)
    for i, t in enumerate(texts):
        ref = _py_ref(t)
        got = out[i]
        for k, v in ref.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=1e-6), (i, k)
            else:
                assert got[k] == v, (i, k)


def test_duckdb_oracle_bit_parity(spark, tmp_path):
    texts = [
        "The quick brown fox jumps over the lazy dog. It barked!",
        "Sentence knowledge university queueing. Twice the rate?",
        "no punctuation at all here",
        "",
        "12345",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pq = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    want = {
        r[0]: r
        for r in con.execute(
            readability_sql() + " ORDER BY doc_id"
        ).fetchall()
    }
    got = {r["doc_id"]: r for r in readability(df).collect()}
    assert set(got) == set(want)
    for k in got:
        g = got[k]
        w = want[k]
        assert (
            g["n_words"], g["n_sentences"], g["n_syllables"],
            g["n_complex_words"],
        ) == tuple(w[1:5]), k
        for gi, wi in zip(
            (g["flesch_reading_ease"], g["fk_grade"], g["gunning_fog"]),
            w[5:8],
        ):
            assert gi == wi, (k, gi, wi)  # bit parity, not approx


def test_plan_is_map_only_and_python_free(spark):
    df = readability(
        spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan

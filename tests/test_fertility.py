"""operators/bpe.py::tokenizer_fertility (T110) — per-language
fertility/compression: the no-merge hand pin (fertility = chars per
word), merge monotonicity (more merges never raise fertility),
per-language separation, zero-word languages -> NULL metrics,
bit-equal partitioning invariance, and DuckDB twin parity (composed
over the generated BPE-encode twin)."""

from __future__ import annotations

import duckdb
import pytest

from warcsum_spark.operators.bpe import (
    tokenizer_fertility,
    tokenizer_fertility_sql,
)

MERGES = [("a", "b</w>"), ("a", "a"), ("aa", "ab</w>")]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def _run(spark, rows, merges):
    out = tokenizer_fertility(_df(spark, rows), merges).collect()
    return {r["lang"]: r.asDict() for r in out}


def test_no_merges_fertility_is_chars_per_word(spark):
    # zero merges: every word encodes to len(word) symbols
    got = _run(spark, [("abc de", "xx"), ("fghi", "xx")], [])
    r = got["xx"]
    assert r["n_docs"] == 2 and r["n_words"] == 3
    assert r["n_tokens"] == 3 + 2 + 4
    assert r["fertility"] == pytest.approx(9 / 3, abs=1e-9)
    # raw text bytes include the space: 6 + 4 = 10
    assert r["bytes_per_token"] == pytest.approx(10 / 9, abs=1e-6)
    assert r["chars_per_token"] == pytest.approx(10 / 9, abs=1e-6)


def test_merges_lower_fertility_monotonically(spark):
    rows = [("aaab aab ab", "aa"), ("ab ab aaab", "aa")]
    base = _run(spark, rows, [])["aa"]["fertility"]
    one = _run(spark, rows, MERGES[:1])["aa"]["fertility"]
    full = _run(spark, rows, MERGES)["aa"]["fertility"]
    assert base >= one >= full
    assert full < base


def test_languages_separate(spark):
    rows = [("ab ab", "L1"), ("xyzq xyzq xyzq", "L2")]
    got = _run(spark, rows, MERGES[:1])
    # L1: 'ab' -> 'ab</w>' (one token); L2: no merge applies -> 4 chars
    assert got["L1"]["fertility"] == pytest.approx(1.0, abs=1e-9)
    assert got["L2"]["fertility"] == pytest.approx(4.0, abs=1e-9)
    assert got["L1"]["n_docs"] == 1 and got["L2"]["n_docs"] == 1


def test_zero_word_language_yields_nulls(spark):
    got = _run(spark, [("", "empty"), ("  ", "empty"), ("ab", "ok")], [])
    e = got["empty"]
    assert e["n_words"] == 0 and e["n_tokens"] == 0
    assert e["fertility"] is None
    assert e["bytes_per_token"] is None
    assert e["chars_per_token"] is None
    assert got["ok"]["fertility"] == 2.0


def test_multibyte_text_bytes_exceed_chars(spark):
    got = _run(spark, [("héllo wörld", "de")], [])
    r = got["de"]
    assert r["bytes_per_token"] > r["chars_per_token"]


def test_partitioning_invariance_bit_equal(spark):
    rows = [
        (f"w{i % 5} aaab ab w{i % 3}", f"L{i % 4}") for i in range(60)
    ]
    df = _df(spark, rows)
    a = sorted(
        map(tuple, tokenizer_fertility(df.repartition(1), MERGES).collect())
    )
    b = sorted(
        map(tuple, tokenizer_fertility(df.repartition(11), MERGES).collect())
    )
    assert a == b


def test_duckdb_twin_bit_parity(spark):
    rows = [
        ("aaab aab ab deed", "L1"),
        ("ab ab aaab xyz", "L1"),
        ("xyzq wörld", "L2"),
        ("", "L3"),
    ]
    got = _run(spark, rows, MERGES)
    con = duckdb.connect()
    con.execute("CREATE TABLE D (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO D VALUES (?, ?, ?)",
        [(i, t, l) for i, (t, l) in enumerate(rows)],
    )
    sql = tokenizer_fertility_sql(
        "src AS (SELECT doc_id, text, lang FROM D)", MERGES
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows_o = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    assert set(rows_o) == set(got)
    for lang, d in rows_o.items():
        for k, v in d.items():
            assert got[lang][k] == v, (lang, k, got[lang][k], v)

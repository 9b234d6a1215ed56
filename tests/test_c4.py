"""functions/c4.py (T82) — C4-style line-level cleaning: each line
rule in isolation, the page-level flag battery, a pure-Python
reference twin, carry columns, and the zero-exchange / Python-free
plan contract."""

from __future__ import annotations

import re

from warcsum_spark.functions.c4 import DEFAULT_BLOCKLIST, c4_clean

_TERMINAL = re.compile(r'[.!?"]$')
_THREE_WORDS = re.compile(r"[^ \t]+[ \t]+[^ \t]+[ \t]+[^ \t]")


def _py_ref(text: str, blocklist=DEFAULT_BLOCKLIST, min_sentences=5):
    lines = text.split("\n")
    kept = []
    for ln in lines:
        s = re.sub(r"[ \t\r]+$", "", ln)
        if (
            _TERMINAL.search(s)
            and _THREE_WORDS.search(s)
            and "javascript" not in s.lower()
        ):
            kept.append(ln)  # the ORIGINAL line survives, not the strip
    clean = "\n".join(kept)
    norm = re.sub("^ | $", "", re.sub("[ \t\n\x0b\f\r]+", " ", text.lower()))
    pad = " " + norm + " "
    n_sentences = sum(clean.count(m) for m in ".!?")
    hits = sum(1 for w in blocklist if f" {w} " in pad)
    return {
        "n_lines": len(lines),
        "n_kept": len(kept),
        "n_sentences": n_sentences,
        "has_lorem_ipsum": "lorem ipsum" in pad,
        "has_brace": "{" in text,
        "blockword_hits": hits,
        "keep_page": n_sentences >= min_sentences
        and "lorem ipsum" not in pad
        and "{" not in text
        and hits == 0,
    }


def _run(spark, rows, **kw):
    df = c4_clean(
        spark.createDataFrame(rows, "doc_id long, text string"), **kw
    )
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_terminal_punctuation_rule(spark):
    out = _run(spark, [(1, "one two three.\none two three\nend with bang!")])
    # middle line lacks terminal punctuation
    assert out[1]["n_kept"] == 2
    assert "one two three\n" not in out[1]["clean_text"] + "\n"


def test_trailing_whitespace_stripped_before_probe(spark):
    out = _run(spark, [(1, "one two three. \t\r\nfour five six.")])
    assert out[1]["n_kept"] == 2


def test_three_word_rule(spark):
    out = _run(spark, [(1, "Too short.\na b c.\nexactly three words!")])
    assert out[1]["n_kept"] == 2
    assert not out[1]["clean_text"].startswith("Too")


def test_javascript_rule_any_case(spark):
    out = _run(
        spark,
        [(1, "Enable JavaScript to continue here.\nplain good line here.")],
    )
    assert out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "plain good line here."


def test_page_flags_and_keep(spark):
    good = "\n".join(["w1 w2 w3 w4."] * 6)
    out = _run(
        spark,
        [
            (1, good),
            (2, good + "\nsee Lorem Ipsum text."),
            (3, good + "\ncode { body }"),
            (4, good + "\nobscenityone appears here today."),
            (5, "only one sentence here."),
        ],
    )
    assert out[1]["keep_page"] and out[1]["n_sentences"] == 6
    assert out[2]["has_lorem_ipsum"] and not out[2]["keep_page"]
    assert out[3]["has_brace"] and not out[3]["keep_page"]
    assert out[4]["blockword_hits"] == 1 and not out[4]["keep_page"]
    # 5: one sentence < min_sentences
    assert out[5]["n_sentences"] == 1 and not out[5]["keep_page"]


def test_min_sentences_param(spark):
    out = _run(spark, [(1, "a b c.\nd e f.")], min_sentences=2)
    assert out[1]["keep_page"]


def test_matches_python_reference(spark):
    texts = [
        "Alpha beta gamma.\nshort\nDelta epsilon zeta?",
        'quoted line three words"\nlorem ipsum dolor sit.',
        "x { y }\none two three.\nfour five six!",
        "",
        "no terminal anywhere at all",
        "obscenityone obscenitytwo flagged twice ok.",
    ]
    out = _run(spark, list(enumerate(texts)))
    for i, t in enumerate(texts):
        ref = _py_ref(t)
        got = out[i]
        for k, v in ref.items():
            assert got[k] == v, (t, k, got[k], v)


def test_carry_cols_and_schema(spark):
    df = c4_clean(
        spark.createDataFrame(
            [(1, "en", "a b c.")], "doc_id long, lang string, text string"
        ),
        carry_cols=("lang",),
    )
    assert df.columns == [
        "doc_id",
        "lang",
        "n_lines",
        "n_kept",
        "clean_text",
        "n_sentences",
        "has_lorem_ipsum",
        "has_brace",
        "blockword_hits",
        "keep_page",
    ]
    assert df.collect()[0]["lang"] == "en"


def test_plan_has_no_exchange_and_no_python(spark):
    df = c4_clean(
        spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan

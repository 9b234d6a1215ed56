"""functions/scripts.py — Unicode script profiling vs a pure-Python
range twin, dominant-script semantics, and nulls."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.functions.scripts import SCRIPT_RANGES, with_script_profile

TEXTS = {
    0: "plain english text with words",
    1: "Русский текст на кириллице",
    2: "这是一段中文文本",
    3: "mixed 中文 and english text",
    4: "نص عربي قصير",
    5: "한국어 텍스트",
    6: "Ελληνικά",
    7: "टेक्स्ट हिंदी",
    8: "עברית",
    9: "12345 !!! ???",     # no scripted chars → und
    10: "",
    11: None,
    12: "café naïve — Łódź",  # Latin-extended accents count as latin
}

_RANGES = {
    "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
    "cyrillic": [(0x400, 0x4FF)],
    "greek": [(0x370, 0x3FF)],
    "arabic": [(0x600, 0x6FF), (0x750, 0x77F)],
    "hebrew": [(0x590, 0x5FF)],
    "devanagari": [(0x900, 0x97F)],
    "hangul": [(0x1100, 0x11FF), (0xAC00, 0xD7AF)],
    "cjk": [(0x3040, 0x30FF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF)],
}


def _ref_counts(text):
    out = {k: 0 for k in _RANGES}
    for ch in text or "":
        cp = ord(ch)
        for name, ranges in _RANGES.items():
            if any(lo <= cp <= hi for lo, hi in ranges):
                out[name] += 1
    return out


def test_counts_and_guess_match_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in with_script_profile(df).collect()}
    for i, t in TEXTS.items():
        want = _ref_counts(t)
        for name in SCRIPT_RANGES:
            assert rows[i][f"script_{name}"] == want[name], (i, name)
        best = max(want.values())
        want_guess = (
            "und" if best <= 0 else min(k for k, v in want.items() if v == best)
        )
        assert rows[i]["script_guess"] == want_guess, (i, t)


def test_null_and_empty_are_und_with_zero_frac(spark):
    df = spark.createDataFrame([(0, None), (1, "")], "doc_id long, text string")
    for r in with_script_profile(df).collect():
        assert r["script_guess"] == "und"
        assert r["script_char_frac"] == 0.0


def test_map_only_jvm_plan(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    plan = (
        with_script_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan

"""operators/line_dedup.py (T81) — within-document duplicate-line
removal: first-occurrence keep order, blank-line passthrough, carry
columns, a pure-Python reference twin, and the zero-exchange /
Python-free plan contract."""

from __future__ import annotations

import re

from warcsum_spark.operators.line_dedup import dedup_lines

_NONBLANK = re.compile("[^ \t\n\x0b\f\r]")


def _py_ref(text: str) -> tuple[int, int, str]:
    lines = text.split("\n")
    seen, kept = set(), []
    for ln in lines:
        if not _NONBLANK.search(ln):
            kept.append(ln)
        elif ln not in seen:
            seen.add(ln)
            kept.append(ln)
    return len(lines), len(lines) - len(kept), "\n".join(kept)


def _run(spark, rows):
    df = dedup_lines(spark.createDataFrame(rows, "doc_id long, text string"))
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_keeps_first_occurrence_in_order(spark):
    out = _run(spark, [(1, "a\nb\na\nc\nb\nd")])
    assert out[1]["clean_text"] == "a\nb\nc\nd"
    assert out[1]["n_lines"] == 6 and out[1]["n_dropped"] == 2


def test_blank_lines_pass_through(spark):
    # blank/whitespace-only lines are layout: never dropped, never a
    # reason to drop a later non-blank line
    out = _run(spark, [(1, "a\n\na\n  \n\nb")])
    assert out[1]["clean_text"] == "a\n\n  \n\nb"
    assert out[1]["n_dropped"] == 1


def test_no_duplicates_is_identity(spark):
    text = "alpha\nbeta\ngamma"
    out = _run(spark, [(1, text), (2, ""), (3, "solo")])
    assert out[1]["clean_text"] == text and out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_lines"] == 1
    assert out[3]["clean_text"] == "solo"


def test_matches_python_reference(spark):
    texts = [
        "x\ny\nx\nz\ny\nx",
        "SHARE\nbody one\nSHARE\nbody two\nSHARE",
        "\n\na\na\n\n",
        "t t t\nt t t\nt t  t",  # whitespace-sensitive exact match
    ]
    out = _run(spark, list(enumerate(texts)))
    for i, t in enumerate(texts):
        n, d, c = _py_ref(t)
        assert out[i]["n_lines"] == n, t
        assert out[i]["n_dropped"] == d, t
        assert out[i]["clean_text"] == c, t


def test_carry_cols_and_schema(spark):
    df = dedup_lines(
        spark.createDataFrame(
            [(1, "s1", "a\na")], "doc_id long, source string, text string"
        ),
        carry_cols=("source",),
    )
    assert df.columns == ["doc_id", "source", "n_lines", "n_dropped",
                          "clean_text"]
    row = df.collect()[0]
    assert row["source"] == "s1" and row["n_dropped"] == 1


def test_plan_has_no_exchange_and_no_python(spark):
    df = dedup_lines(
        spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan

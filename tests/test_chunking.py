"""operators/chunking.py — window coverage/overlap invariants vs a
pure-Python twin, edge cases, and the no-shuffle plan property."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from warcsum_spark.operators.chunking import chunk_documents


def _ref_chunks(text, c, o):
    norm = re.sub("^ | $", "", re.sub("[ \t\n\x0b\f\r]+", " ", text))
    words = norm.split(" ") if norm else []
    if not words:
        return []
    step = c - o
    k = max(1, -(-(len(words) - o) // step))
    return [
        (i, min(c, len(words) - i * step), " ".join(words[i * step : i * step + c]))
        for i in range(k)
    ]


def _run(spark, texts, c, o):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {}
    for r in chunk_documents(df, chunk_tokens=c, overlap=o).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_words"], r["chunk_text"])
        )
    return {k: sorted(v) for k, v in out.items()}


@pytest.mark.parametrize("c,o", [(5, 0), (5, 2), (8, 7), (3, 1)])
def test_matches_reference(spark, c, o):
    texts = [
        " ".join(f"w{i}" for i in range(n))
        for n in (0, 1, 2, c - 1, c, c + 1, 2 * c, 37)
    ] + ["  padded   with\nweird\tspacing  "]
    got = _run(spark, texts, c, o)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _ref_chunks(t, c, o), (i, c, o)


def test_coverage_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    chunks = _run(spark, [text], 30, 10)[0]
    # consecutive chunks share exactly `overlap` words
    for (_, _, a), (_, _, b) in zip(chunks, chunks[1:]):
        assert a.split(" ")[-10:] == b.split(" ")[:10]
    # every word appears in at least one chunk
    covered = set()
    for _, _, t in chunks:
        covered.update(t.split(" "))
    assert covered == {f"w{i}" for i in range(100)}


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=-1)


def test_map_only_plan(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan

"""operators/para_dedup.py — corpus-wide paragraph dedup + reassembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.para_dedup import dedup_paragraphs, explode_paragraphs


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_paragraphs(df).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_first_occurrence_wins_and_docs_rebuild(spark):
    got = _run(
        spark,
        [
            (1, "unique one\n\nshared footer\n\nunique two"),
            (2, "other content\n\nshared footer"),
            (3, "shared footer"),
        ],
    )
    assert got[1]["text"] == "unique one\n\nshared footer\n\nunique two"
    assert got[2]["text"] == "other content"
    assert got[3]["text"] == ""  # everything it had was already seen
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (1, 0)
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)


def test_row_count_preserved_and_intra_doc_dedup(spark):
    got = _run(spark, [(1, "rep\n\nrep\n\nrep"), (2, ""), (3, "  \n\n \t")])
    assert set(got) == {1, 2, 3}  # empty docs keep their rows
    assert got[1]["text"] == "rep"  # repeated paragraph kept once
    assert got[2] == {"doc_id": 2, "text": "", "n_paras": 0, "n_kept": 0}
    assert got[3]["n_paras"] == 0  # whitespace-only paragraphs are not units


def test_multi_newline_separators_collapse(spark):
    got = _run(spark, [(1, "a\n\n\n\nb\n\n\nc")])
    assert got[1]["text"] == "a\n\nb\n\nc"
    assert got[1]["n_paras"] == 3


def test_determinism_under_repartition(spark):
    rows = [(i, f"common intro\n\nbody {i % 7}\n\ntail {i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["text"] for r in dedup_paragraphs(df).collect()}
    b = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df.repartition(13)).collect()
    }
    assert a == b
    # only doc 0 keeps the shared intro
    assert a[0].startswith("common intro")
    assert all(not a[i].startswith("common intro") for i in range(1, 60))


def test_shuffle_carries_digest_not_payload(spark):
    """The keep-decision path (explode → window on phash) must be able
    to drop the paragraph text before the wide exchange."""
    df = spark.createDataFrame([(1, "x\n\ny")], "doc_id long, text string")
    slim = explode_paragraphs(df).select("doc_id", "para_idx", "phash")
    assert set(slim.columns) == {"doc_id", "para_idx", "phash"}

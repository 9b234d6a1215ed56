"""T58 taxonomy tagging (operators/tagging.py): exact-count semantics
vs an independent Python tokenizer, phrase handling, zero-exchange plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from warcsum_spark.operators.tagging import tag_topics, tagging_oracle_sql, top_topic

TAX = {
    "exec": ["scan", "join", "hash join"],
    "stream": ["stream", "batch"],
}


def _ref_counts(text, taxonomy):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
    out = {}
    for topic, kws in taxonomy.items():
        hits = 0
        for kw in kws:
            ktoks = kw.lower().split()
            hits += sum(
                1
                for i in range(len(toks) - len(ktoks) + 1)
                if toks[i : i + len(ktoks)] == ktoks
            )
        out[topic] = hits
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_counts_match_token_reference(spark):
    texts = [
        "scan the table, then JOIN; hash join beats sort",
        "stream stream stream batch",
        "nothing relevant here",
        "join join join",
        "a hash  join with odd   spacing and punctuation!!!",
    ]
    got = {
        (r.doc_id, r.topic): r.hits
        for r in tag_topics(_df(spark, texts), TAX, min_hits=1).collect()
    }
    for i, t in enumerate(texts):
        for topic, hits in _ref_counts(t, TAX).items():
            if hits >= 1:
                assert got[(i, topic)] == hits, (i, topic)
            else:
                assert (i, topic) not in got


def test_phrase_counts_are_word_boundary_exact(spark):
    # "hash join" must not match inside "rehash joint"; "join" token
    # still matches the "join" inside "hash join" (independent keyword)
    texts = ["rehash joint venture", "hash join hash join"]
    got = {
        (r.doc_id, r.topic): r.hits
        for r in tag_topics(_df(spark, texts), TAX).collect()
    }
    assert (0, "exec") not in got
    assert got[(1, "exec")] == 4  # 2× "hash join" + 2× "join"


def test_top_topic_tiebreak(spark):
    texts = ["scan stream"]  # exec=1, stream=1 → lexicographic 'exec'
    top = top_topic(tag_topics(_df(spark, texts), TAX)).collect()
    assert len(top) == 1 and top[0].topic == "exec"


def test_oracle_sql_matches(spark, tmp_path):
    import duckdb

    texts = [
        "scan join hash join stream",
        "batch batch stream scan!",
        "unrelated words only",
    ]
    df = _df(spark, texts)
    got = sorted(
        (r.doc_id, r.topic, r.hits)
        for r in tag_topics(df, TAX).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    want = sorted(map(tuple, con.sql(tagging_oracle_sql(TAX)).fetchall()))
    assert got == want


def test_zero_exchange_plan(spark):
    df = _df(spark, ["scan join"])
    plan = (
        tag_topics(df, TAX)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # all JVM

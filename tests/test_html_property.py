"""Property check of the dual-engine (Spark/Java regex vs DuckDB/RE2)
equivalence claim for the SQL-tier HTML extraction and PII redaction:
generated adversarial strings — tag soup, half-open script/style blocks,
entity pileups, digit/separator runs — must produce IDENTICAL output in
both engines. One Spark job + one DuckDB query for the whole corpus
(not per-example) so 300 examples stay fast."""

from __future__ import annotations

import duckdb
from hypothesis import strategies as st

from pyspark.sql import functions as F

from warcsum_spark.functions.html import (
    html_to_text,
    html_to_text_sql,
    redact_pii,
    redact_pii_sql,
)

_FRAGMENTS = st.sampled_from(
    [
        "<script>", "</script>", "</script >", "<SCRIPT a='b'>",
        "<style>", "</style>", "<style media=x>",
        "<!--", "-->", "<!-- c -->",
        "<p>", "</p>", "<a href='x'>", "<div class=\"y\">", "<>", "< p >",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;", "&x;",
        "text", "words here", "a<b", "c>d", "if (a<b && c>d) {}",
        " ", "\t", "\n", "  ", "'", '"',
        "+1 (555) 010-1234", "123-45-6789", "10.0.0.1", "192.168.255.254",
        "a@b.io", "first.last+t@ex.co.uk", "12-34", "1234567", "+44 20 7946 0958",
        "ends 999.999.999.999", "call 5551234567 now",
    ]
)


def _corpus(n: int = 300) -> list[str]:
    strat = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("".join)
    out = []
    # deterministic corpus: walk hypothesis' example generator with fixed
    # seeds so CI never flakes on a random draw
    from hypothesis import HealthCheck, Phase, given, settings

    @settings(
        max_examples=n,
        phases=[Phase.generate],
        suppress_health_check=list(HealthCheck),
        deadline=None,
        derandomize=True,
    )
    @given(strat)
    def collect(s):
        out.append(s)

    collect()
    return sorted(set(out))


def test_sql_tier_matches_duckdb_on_generated_soup(spark):
    corpus = _corpus()
    assert len(corpus) > 100
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "i int, s string"
    )
    spark_rows = {
        r["i"]: (r["ht"], r["pii"])
        for r in df.select(
            "i",
            html_to_text(F.col("s")).alias("ht"),
            redact_pii(F.col("s")).alias("pii"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(corpus)))
    duck_rows = {
        i: (ht, pii)
        for i, ht, pii in con.execute(
            f"SELECT i, {html_to_text_sql('s')} AS ht, {redact_pii_sql('s')} AS pii FROM t"
        ).fetchall()
    }

    mismatches = {
        corpus[i]: (spark_rows[i], duck_rows[i])
        for i in spark_rows
        if spark_rows[i] != duck_rows[i]
    }
    assert not mismatches, list(mismatches.items())[:5]

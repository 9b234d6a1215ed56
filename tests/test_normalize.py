"""T59 Unicode canonicalization (functions/normalize.py): NFC/fold
semantics vs Python unicodedata, cross-engine parity with the generated
DuckDB expression, map-only plan."""

from __future__ import annotations

import unicodedata

import duckdb
from pyspark.sql import functions as F

from warcsum_spark.functions.normalize import normalize_sql_expr, normalize_text

CASES = [
    "café composed vs café",  # NFD é vs NFC é
    "zero​width‌ joined﻿",
    "ctrl\x01chars\x1f here\x7f",
    "  runs   of\t\twhitespace\n\n collapse  ",
    "áéñüç accents",
    "non-decomposable ø stays",
    "ligature ﬁn survives NFC",
    "plain ascii unchanged",
]


def _ref(s, accent_fold=False):
    out = unicodedata.normalize("NFC", s)
    if accent_fold:
        out = unicodedata.normalize(
            "NFC",
            "".join(
                c
                for c in unicodedata.normalize("NFD", out)
                if not unicodedata.combining(c)
            ),
        )
    out = "".join(
        c
        for c in out
        if c not in "​‌‍﻿\x7f"
        and not (ord(c) < 0x20 and c not in "\t\n\r")
    )
    return " ".join(out.split())


def _df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "id long, text string"
    )


def test_matches_unicodedata_reference(spark):
    for fold in (False, True):
        got = {
            r.id: r.norm
            for r in _df(spark)
            .select("id", normalize_text(F.col("text"), accent_fold=fold).alias("norm"))
            .collect()
        }
        for i, s in enumerate(CASES):
            assert got[i] == _ref(s, fold), (fold, i, s)


def test_duckdb_expression_is_exact_twin(spark):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") v(id, text)",
        params=list(CASES),
    )
    for fold in (False, True):
        got = {
            r.id: r.norm
            for r in _df(spark)
            .select("id", normalize_text(F.col("text"), accent_fold=fold).alias("norm"))
            .collect()
        }
        want = dict(
            con.sql(
                f"SELECT id, {normalize_sql_expr('text', accent_fold=fold)} AS n FROM t"
            ).fetchall()
        )
        assert got == want, fold


def test_map_only_plan(spark):
    df = _df(spark).select(normalize_text(F.col("text")).alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1

"""operators/docid_remap.py (T93) — URL-sort doc-ID reassignment: the
rank is the exact Python-sorted rank under any partition count, the
output is a dense permutation, clustered vocabularies measurably
compress, the DuckDB twin agrees bit-for-bit, and the plan uses range
partitioning (never a single-partition corpus window)."""

from __future__ import annotations

import duckdb

from warcsum_spark.operators.docid_remap import (
    reassignment_report,
    reassignment_sql,
    url_sort_ids,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )


def test_rank_matches_python_sort_any_partitioning(spark):
    rows = [
        (i, f"http://h{(i * 7) % 5}.test/p{i:03d}", "x") for i in range(97)
    ]
    want = {
        old: rank
        for rank, (old, _, _) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0]))
        )
    }
    for n_parts in (1, 3, 16):
        got = {
            r["old_id"]: r["new_id"]
            for r in url_sort_ids(_docs(spark, rows), n_parts=n_parts).collect()
        }
        assert got == want, n_parts


def test_remap_is_a_dense_permutation(spark):
    rows = [(i * 10, f"u{i % 4}/{i}", "x") for i in range(40)]
    out = url_sort_ids(_docs(spark, rows)).collect()
    assert sorted(r["new_id"] for r in out) == list(range(40))
    assert len({r["old_id"] for r in out}) == 40


def test_duplicate_urls_break_ties_by_old_id(spark):
    rows = [(5, "same", "x"), (1, "same", "x"), (3, "same", "x")]
    got = {
        r["old_id"]: r["new_id"]
        for r in url_sort_ids(_docs(spark, rows)).collect()
    }
    assert got == {1: 0, 3: 1, 5: 2}


def test_clustered_vocabulary_compresses_after_remap(spark):
    # old ids interleave hosts (stride 4); URL sort groups each host's
    # 25 docs contiguously → htok gaps collapse to 1
    rows = [
        (i, f"http://h{i % 4}.test/p{i:03d}", f"htok{i % 4} filler")
        for i in range(100)
    ]
    rep = {
        r["term"]: r
        for r in reassignment_report(_docs(spark, rows)).collect()
    }
    for h in range(4):
        r = rep[f"htok{h}"]
        assert r["saved_gamma_bits"] > 0, h
        # 24 gap-1 runs (1 bit each) + the first gap 25h+1 at γ width
        first = 25 * h + 1
        assert r["gamma_new"] == 24 + (2 * (first.bit_length() - 1) + 1), h
    # the shared term sees every doc either way → no savings possible
    assert rep["filler"]["saved_gamma_bits"] == 0


def test_hot_cap_nulls_both_sides(spark):
    rows = [(i, f"u{i:02d}", "common rare" if i == 0 else "common") for i in range(9)]
    rep = {
        r["term"]: r
        for r in reassignment_report(_docs(spark, rows), max_postings=5).collect()
    }
    assert rep["common"]["gamma_old"] is None
    assert rep["common"]["gamma_new"] is None
    assert rep["common"]["saved_gamma_bits"] is None
    assert rep["rare"]["gamma_old"] is not None


def test_duckdb_twin_bit_parity(spark, tmp_path):
    rows = [
        (i, f"http://h{(i * 3) % 5}.t/p{i:02d}",
         f"htok{(i * 3) % 5} w{i % 7} shared")
        for i in range(60)
    ]
    got = {
        r["term"]: tuple(r)[1:]
        for r in reassignment_report(
            _docs(spark, rows), max_postings=20
        ).collect()
    }
    pq = str(tmp_path / "d.parquet")
    _docs(spark, rows).toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS SELECT * FROM read_parquet('{pq}')")
    sql = reassignment_sql(
        "docs AS (SELECT doc_id, url, text FROM src)", cap=20
    )
    want = {r[0]: tuple(r)[1:] for r in con.execute(sql).fetchall()}
    assert got == want


def test_plan_uses_range_partitioning_no_python(spark):
    rows = [(i, f"u{i}", "x") for i in range(10)]
    plan = (
        url_sort_ids(_docs(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "Python" not in plan and "BatchEval" not in plan

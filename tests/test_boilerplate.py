"""T29 boilerplate removal: within-group df thresholding, small-group
pass-through, blank-line immunity, order preservation — checked against
an independent pure-Python reference."""

from __future__ import annotations

from warcsum_spark.operators.boilerplate import remove_boilerplate


def _ref(rows, min_df_frac=0.5, min_docs=5):
    """Independent reference: dict implementation of the spec."""
    by_group: dict[str, list] = {}
    for doc_id, group, text in rows:
        by_group.setdefault(group, []).append((doc_id, text))
    out = {}
    for group, docs in by_group.items():
        df: dict[str, set] = {}
        for doc_id, text in docs:
            for line in text.split("\n"):
                if line.strip():
                    df.setdefault(line, set()).add(doc_id)
        bl = (
            {l for l, d in df.items() if len(d) >= len(docs) * min_df_frac}
            if len(docs) >= min_docs
            else set()
        )
        for doc_id, text in docs:
            lines = text.split("\n")
            kept = [l for l in lines if l not in bl]
            out[doc_id] = (
                group,
                len(lines),
                len(lines) - len(kept),
                "\n".join(kept),
            )
    return out


def _rows():
    rows = []
    # big group: 6 docs sharing header+footer, one half-common line
    for i in range(6):
        body = f"unique body {i}\ncontent line {i} extra"
        half = "HALF COMMON\n" if i < 3 else ""
        rows.append(
            (i, "big", f"SITE NAV HOME\n{half}{body}\n\nCOPYRIGHT 2020 big")
        )
    # small group (< min_docs): identical docs must pass through
    for i in range(3):
        rows.append((100 + i, "small", "SAME TEXT\nSAME TEXT"))
    return rows


def test_matches_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["source"], r["n_lines"], r["n_removed"], r["clean_text"])
        for r in remove_boilerplate(df).collect()
    }
    assert got == _ref(rows)


def test_semantics(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r for r in remove_boilerplate(df).collect()}
    # header and footer stripped everywhere in the big group
    for i in range(6):
        assert "SITE NAV HOME" not in got[i]["clean_text"]
        assert "COPYRIGHT" not in got[i]["clean_text"]
        assert f"unique body {i}" in got[i]["clean_text"]  # content kept
    # the 50% line is exactly at threshold (3/6): removed
    assert all("HALF COMMON" not in got[i]["clean_text"] for i in range(3))
    # blank lines survive (never counted as boilerplate): the empty line
    # before the footer is now trailing
    assert got[0]["clean_text"].endswith("\n")
    # small group untouched even though every line has df = 100%
    for i in range(3):
        assert got[100 + i]["clean_text"] == "SAME TEXT\nSAME TEXT"
        assert got[100 + i]["n_removed"] == 0
    # order preserved
    body0 = got[0]["clean_text"].split("\n")
    assert body0.index("unique body 0") < body0.index("content line 0 extra")


def test_document_text_never_reshuffles(spark):
    """Plan shape: exchanges carry only slim (group, line[, doc]) keys
    for the df counts and the group-keyed cleaning join — the document
    line array (and with it the full text) stays in its scan partition."""
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = remove_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        seg for seg in plan.splitlines() if "Exchange hashpartitioning" in seg
    ]
    assert exchanges, "expected keyed aggregation exchanges in the plan"
    assert all("_lines" not in seg and "text#" not in seg for seg in exchanges)

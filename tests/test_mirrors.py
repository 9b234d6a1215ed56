"""operators/mirrors.py (T103) — mirror-host detection: a pure-Python
twin, the perfect-mirror pin, a diverged partial mirror, the ubiquity
cap (boilerplate mints no pairs AND leaves the size base), duplicate
collapse, min_shared, DuckDB twin bit parity, and the Python-free
plan."""

from __future__ import annotations

from itertools import combinations

import duckdb
import pytest

from warcsum_spark.operators.mirrors import mirror_hosts, mirror_hosts_sql


def _py_ref(rows, min_shared=2, max_hosts=16):
    d = set(rows)
    spread = {}
    for h, p, fp in d:
        spread.setdefault((p, fp), set()).add(h)
    capped = {
        (h, p, fp) for h, p, fp in d if len(spread[(p, fp)]) <= max_hosts
    }
    sizes = {}
    for h, _, _ in capped:
        sizes[h] = sizes.get(h, 0) + 1
    pairs = {}
    for key, hosts in spread.items():
        if len(hosts) > max_hosts:
            continue
        for a, b in combinations(sorted(hosts), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    out = {}
    for (a, b), sh in pairs.items():
        if sh >= min_shared:
            out[(a, b)] = {
                "shared": sh,
                "size_a": sizes[a],
                "size_b": sizes[b],
                "resemblance": round(sh / (sizes[a] + sizes[b] - sh), 6),
            }
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, path string, fp string")
    return {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_hosts(df, **kw).collect()
    }


def _corpus():
    """Hosts m0/m1 perfect mirrors (6 pages), m2 diverges on 2 of 6,
    host solo shares nothing, boilerplate page on every host."""
    rows = []
    for h in ("m0", "m1", "m2"):
        for p in range(6):
            fp = f"c{p}"
            if h == "m2" and p < 2:
                fp = f"x{p}"
            rows.append((h, f"/p{p}", fp))
    rows += [("solo", f"/s{i}", f"s{i}") for i in range(4)]
    rows += [(h, "/footer", "boiler") for h in ("m0", "m1", "m2", "solo")]
    return rows


def test_python_reference_twin(spark):
    rows = _corpus()
    got = _run(spark, rows, min_shared=1, max_hosts=3)
    ref = _py_ref(rows, min_shared=1, max_hosts=3)
    assert set(got) == set(ref)
    for k in ref:
        for c, v in ref[k].items():
            assert got[k][c] == v, (k, c)


def test_perfect_and_partial_mirrors(spark):
    got = _run(spark, _corpus(), min_shared=2, max_hosts=3)
    # boilerplate key (on 4 hosts > 3) is dropped from pairs AND sizes
    assert got[("m0", "m1")]["shared"] == 6
    assert got[("m0", "m1")]["size_a"] == 6  # not 7
    assert got[("m0", "m1")]["resemblance"] == 1.0
    assert got[("m0", "m2")]["shared"] == 4
    assert got[("m0", "m2")]["resemblance"] == 0.5  # 4/(6+6-4)
    assert not any("solo" in k for k in got)


def test_ubiquity_cap_off_pairs_everyone(spark):
    got = _run(spark, _corpus(), min_shared=1, max_hosts=16)
    # with the cap off, the boilerplate page links solo to the mirrors
    assert ("m0", "solo") in got
    assert got[("m0", "solo")]["shared"] == 1
    assert got[("m0", "m1")]["size_a"] == 7


def test_duplicate_rows_collapse(spark):
    rows = [("a", "/p", "f"), ("a", "/p", "f"), ("b", "/p", "f")]
    got = _run(spark, rows, min_shared=1)
    assert got[("a", "b")]["shared"] == 1
    assert got[("a", "b")]["size_a"] == 1


def test_min_shared_filters(spark):
    rows = [("a", "/p", "f"), ("b", "/p", "f")]
    assert _run(spark, rows, min_shared=2) == {}
    assert ("a", "b") in _run(spark, rows, min_shared=1)


def test_same_path_different_content_is_not_shared(spark):
    rows = [("a", "/p", "f1"), ("b", "/p", "f2")]
    assert _run(spark, rows, min_shared=1) == {}


def test_duckdb_twin_bit_parity(spark):
    rows = _corpus()
    got = _run(spark, rows, min_shared=1, max_hosts=3)
    vals = ", ".join(f"('{h}', '{p}', '{f}')" for h, p, f in rows)
    sql = mirror_hosts_sql(
        f"SELECT * FROM (VALUES {vals}) t(host, path, fp)",
        min_shared=1,
        max_hosts=3,
    )
    cur = duckdb.connect().execute(sql)
    cols = [d[0] for d in cur.description]
    want = {(r[0], r[1]): dict(zip(cols, r)) for r in cur.fetchall()}
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], k


def test_plan_python_free(spark):
    df = spark.createDataFrame(
        [("a", "/p", "f")], "host string, path string, fp string"
    )
    plan = mirror_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan

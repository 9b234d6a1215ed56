"""operators/salsa.py (T111) — SALSA via the Lempel–Moran closed
form: a pure-Python twin (BFS components + degree ratios), the
two-authority star hand pin, the component-weighting pin on uneven
components, exact mass conservation on each side, the
single-component "authority == normalized in-degree" theorem, the TKC
contrast vs HITS (the dense clique does NOT soak up SALSA mass),
roleless-side zeros, duplicate-edge collapse, bit-equal partitioning
invariance, DuckDB twin parity, and composition sanity on a crawl
graph."""

from __future__ import annotations

from collections import defaultdict, deque

import duckdb
import pytest

from warcsum_spark.operators.salsa import salsa, salsa_sql

SCALE = 9


def _py_ref(edges):
    e = sorted(set(edges))
    outdeg, indeg = defaultdict(int), defaultdict(int)
    adj = defaultdict(set)
    for s, d in e:
        outdeg[s] += 1
        indeg[d] += 1
        adj[2 * s].add(2 * d + 1)
        adj[2 * d + 1].add(2 * s)
    comp = {}
    for start in sorted(adj):
        if start in comp:
            continue
        q = deque([start])
        comp[start] = start
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp[v] = start
                    q.append(v)
    hubs, auths = {}, {}
    h_by_c, a_by_c = defaultdict(list), defaultdict(list)
    for n in outdeg:
        h_by_c[comp[2 * n]].append(n)
    for n in indeg:
        a_by_c[comp[2 * n + 1]].append(n)
    n_h, n_a = len(outdeg), len(indeg)
    for c, members in h_by_c.items():
        e_c = sum(outdeg[m] for m in members)
        for m in members:
            hubs[m] = round(len(members) * outdeg[m] / (n_h * e_c), SCALE)
    for c, members in a_by_c.items():
        e_c = sum(indeg[m] for m in members)
        for m in members:
            auths[m] = round(len(members) * indeg[m] / (n_a * e_c), SCALE)
    nodes = set(outdeg) | set(indeg)
    return {
        n: {"hub": hubs.get(n, 0.0), "authority": auths.get(n, 0.0)}
        for n in nodes
    }


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r.asDict() for r in salsa(df).collect()}


def _check(spark, edges):
    got = _run(spark, edges)
    ref = _py_ref(edges)
    assert set(got) == set(ref)
    for n in ref:
        assert got[n]["hub"] == pytest.approx(ref[n]["hub"], abs=1e-9), n
        assert got[n]["authority"] == pytest.approx(
            ref[n]["authority"], abs=1e-9
        ), n
    return got


def test_star_hand_pin(spark):
    # h -> {a1, a2}: hub(h) = 1; authority(a1) = authority(a2) = 1/2
    got = _check(spark, [(0, 1), (0, 2)])
    assert got[0]["hub"] == 1.0 and got[0]["authority"] == 0.0
    assert got[1]["authority"] == 0.5 and got[1]["hub"] == 0.0
    assert got[2]["authority"] == 0.5


def test_component_weighting_pin(spark):
    # comp1 (hubs 10,11,12 all reach a1/a2 through hub 12's two edges):
    # A_c = {a1 (indeg 3), a2 (indeg 1)}, E_c = 4; comp2: h13 -> a3.
    # authority(a1) = (2/3)*(3/4) = 1/2 ; a2 = (2/3)*(1/4) = 1/6 ;
    # a3 = (1/3)*(1/1) = 1/3 — masses sum to 1 across components
    edges = [(10, 1), (11, 1), (12, 1), (12, 2), (13, 3)]
    got = _check(spark, edges)
    assert got[1]["authority"] == pytest.approx(1 / 2, abs=1e-9)
    assert got[2]["authority"] == pytest.approx(1 / 6, abs=1e-9)
    assert got[3]["authority"] == pytest.approx(1 / 3, abs=1e-9)


def test_mass_conserved_each_side(spark):
    edges = [
        (i % 7, (i * 3 + 1) % 11 + 20) for i in range(25)
    ] + [(100, 101), (102, 101), (102, 103)]
    got = _check(spark, edges)
    assert sum(v["hub"] for v in got.values()) == pytest.approx(1, abs=1e-6)
    assert sum(v["authority"] for v in got.values()) == pytest.approx(
        1, abs=1e-6
    )


def test_single_component_authority_is_indegree_share(spark):
    # the Lempel-Moran theorem: one component -> authority = indeg/|E|
    edges = [(0, 10), (1, 10), (2, 10), (0, 11), (1, 12)]
    got = _check(spark, edges)
    assert got[10]["authority"] == pytest.approx(3 / 5, abs=1e-9)
    assert got[11]["authority"] == pytest.approx(1 / 5, abs=1e-9)
    assert got[12]["authority"] == pytest.approx(1 / 5, abs=1e-9)


def test_tkc_contrast_vs_hits(spark):
    # dense 3x3 clique (TKC) + a bigger sparse community. HITS gives
    # the clique's authorities essentially ALL the mass; SALSA keeps
    # the sparse side's total share proportional to its size.
    clique = [(h, a) for h in (0, 1, 2) for a in (10, 11, 12)]
    sparse = [(20 + i, 30 + i) for i in range(6)] + [(20, 31), (21, 32)]
    edges = clique + sparse
    got = _check(spark, edges)
    from warcsum_spark.operators.hits import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    h = {r["node"]: r["authority"] for r in hits(df, iters=6).collect()}
    hits_sparse = sum(h[n] for n in range(30, 36))
    hits_clique = sum(h[n] for n in (10, 11, 12))
    salsa_sparse = sum(got[n]["authority"] for n in range(30, 36))
    salsa_clique = sum(got[n]["authority"] for n in (10, 11, 12))
    assert hits_sparse < 0.01 * hits_clique  # TKC: HITS starves the rest
    assert salsa_sparse > salsa_clique  # SALSA: more authorities, more mass


def test_duplicate_edges_collapse(spark):
    a = _run(spark, [(0, 1), (0, 2)])
    b = _run(spark, [(0, 1), (0, 1), (0, 2), (0, 2), (0, 2)])
    assert a == b


def test_partitioning_invariance_bit_equal(spark):
    edges = [((i * 5) % 17, 100 + (i * i) % 13) for i in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, salsa(df.repartition(1)).collect()))
    b = sorted(map(tuple, salsa(df.repartition(13)).collect()))
    assert a == b


def test_duckdb_twin_bit_parity(spark):
    edges = sorted(
        set(
            [((i * 5) % 11, 50 + (i * 7) % 9) for i in range(40)]
            + [(100, 200), (101, 200), (101, 201)]
        )
    )
    got = _run(spark, edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE E (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO E VALUES (?, ?)", edges)
    cur = con.execute(salsa_sql("SELECT src, dst FROM E"))
    cols = [d[0] for d in cur.description]
    fetched = cur.fetchall()
    # one row per node — guards the WITH RECURSIVE union-dedup hazard
    assert len(fetched) == len(got)
    rows = {r[0]: dict(zip(cols, r)) for r in fetched}
    assert set(rows) == set(got)
    for n, d in rows.items():
        for k, v in d.items():
            assert got[n][k] == v, (n, k, got[n][k], v)


def test_self_loop_holds_both_roles(spark):
    got = _check(spark, [(5, 5)])
    assert got[5]["hub"] == 1.0 and got[5]["authority"] == 1.0

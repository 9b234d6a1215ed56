"""operators/crawl_order.py (T122) — Cho/Garcia-Molina/Page crawl-
ordering evaluation: an independent Python twin, the paper's
backlink-beats-random ordering pin, exact checkpoint arithmetic at
awkward n, the 100% ≡ full-recall identity, parameter validation,
partitioning invariance, and DuckDB twin parity."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from warcsum_spark.operators.crawl_order import (
    crawl_ordering_eval,
    crawl_ordering_oracle_sql,
)

CPS = (10, 25, 50, 100)


def _py_ref(edges, hot_pct=10, checkpoints=CPS):
    e = sorted(set(edges))
    nodes = sorted({x for ed in e for x in ed})
    indeg = {n: 0 for n in nodes}
    for _, d in e:
        indeg[d] += 1
    n = len(nodes)
    hot_total = max(1, n * hot_pct // 100)
    by_backlink = sorted(nodes, key=lambda x: (-indeg[x], x))
    pos = {
        "backlink": {x: i for i, x in enumerate(by_backlink)},
        "discovery": {x: i for i, x in enumerate(sorted(nodes))},
        "random": {
            x: i
            for i, x in enumerate(
                sorted(
                    nodes,
                    key=lambda x: (
                        hashlib.md5(str(x).encode()).hexdigest(),
                        x,
                    ),
                )
            )
        },
    }
    hot = set(by_backlink[:hot_total])
    out = {}
    for name, p in pos.items():
        for c in checkpoints:
            crawled = [x for x in nodes if 100 * (p[x] + 1) <= n * c]
            found = sum(1 for x in crawled if x in hot)
            out[(name, c)] = (
                n,
                len(crawled),
                hot_total,
                found,
                round(found / hot_total, 6),
            )
    return out


def _run(spark, edges, hot_pct=10, checkpoints=CPS):
    df = spark.createDataFrame(edges, "src long, dst long")
    res = crawl_ordering_eval(df, hot_pct=hot_pct, checkpoints=checkpoints)
    return {
        (r["ordering"], r["checkpoint_pct"]): (
            r["n_nodes"], r["crawled"], r["hot_total"], r["hot_found"],
            r["recall"],
        )
        for r in res.collect()
    }


def _star_graph():
    """Hubs 0-2 with heavy fan-in, a tail of low-degree pages — the
    paper's setting where greedy ordering wins clearly."""
    edges = []
    for i in range(3, 60):
        edges.append((i, i % 3))          # everyone links a hub
        edges.append((i, 3 + (i * 7) % 57))  # plus one tail link
    return edges


def test_python_twin(spark):
    edges = _star_graph()
    assert _run(spark, edges) == _py_ref(edges)


def test_backlink_beats_random_early(spark):
    got = _run(spark, _star_graph())
    # the paper's headline: the greedy ordering has all hot pages
    # almost immediately; at the 10% budget it is already complete
    assert got[("backlink", 10)][4] == 1.0
    assert got[("random", 10)][4] < 1.0
    # and every ordering converges to full recall at 100%
    for name in ("backlink", "discovery", "random"):
        assert got[(name, 100)][4] == 1.0


def test_awkward_n_checkpoint_arithmetic(spark):
    # 7 nodes: k at 10% = floor(0.7) = 0 pages crawled, 25% → 1, …
    edges = [(i, (i + 1) % 7) for i in range(7)]
    got = _run(spark, edges)
    ref = _py_ref(edges)
    assert got == ref
    assert got[("discovery", 10)][1] == 0
    assert got[("discovery", 25)][1] == 1


def test_param_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="hot_pct"):
        crawl_ordering_eval(df, hot_pct=0)
    with pytest.raises(ValueError, match="checkpoints"):
        crawl_ordering_eval(df, checkpoints=())


def test_partitioning_invariance(spark):
    edges = _star_graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, crawl_ordering_eval(df).collect()))
    b = sorted(map(tuple, crawl_ordering_eval(df.repartition(7)).collect()))
    assert a == b


def test_duckdb_twin_parity(spark):
    edges = _star_graph()
    edges_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in edges
    ) + ") AS t(src, dst)"
    ora = {
        (r[0], r[1]): tuple(r)[2:]
        for r in duckdb.sql(crawl_ordering_oracle_sql(edges_cte)).fetchall()
    }
    assert _run(spark, edges) == ora

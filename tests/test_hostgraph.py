"""T41 — host-graph aggregation: edges, degrees, reciprocity."""

from __future__ import annotations

from warcsum_spark.operators.hostgraph import host_edges, host_graph_stats


def _links(spark):
    rows = [
        # a <-> b reciprocal (a->b twice at page level)
        ("http://a.test/1", "http://b.test/x"),
        ("http://a.test/2", "http://b.test/y"),
        ("http://b.test/1", "http://a.test/z"),
        # a -> c one-way; c is also a pure-sink target of b
        ("http://a.test/3", "http://c.test/x"),
        ("http://b.test/2", "http://c.test/x"),
        # self-loop, dropped by default
        ("http://a.test/4", "http://a.test/5"),
        # host extraction: scheme/port/case
        ("HTTPS://A.TEST:8443/6", "http://D.test/x"),
    ]
    return spark.createDataFrame(rows, "src_url string, dst_url string")


def test_host_edges(spark):
    e = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_edges(_links(spark)).collect()
    }
    assert e == {
        ("a.test", "b.test"): 2,
        ("b.test", "a.test"): 1,
        ("a.test", "c.test"): 1,
        ("b.test", "c.test"): 1,
        ("a.test", "d.test"): 1,
    }


def test_host_edges_keep_self_loops(spark):
    e = host_edges(_links(spark), keep_self_loops=True)
    assert e.filter("src_host = dst_host").count() == 1


def test_host_graph_stats(spark):
    s = {
        r["host"]: r
        for r in host_graph_stats(host_edges(_links(spark))).collect()
    }
    a = s["a.test"]
    assert (a["out_degree"], a["in_degree"]) == (3, 1)
    assert (a["out_links"], a["in_links"]) == (4, 1)
    assert a["reciprocal"] == 1 and a["reciprocity"] == round(1 / 3, 6)
    b = s["b.test"]
    assert b["reciprocal"] == 1 and b["reciprocity"] == 0.5
    c = s["c.test"]  # pure sink: no outgoing edges
    assert (c["out_degree"], c["in_degree"]) == (0, 2)
    assert c["reciprocity"] is None
    assert s["d.test"]["in_links"] == 1


def test_host_graph_plan_is_python_free(spark):
    plan = (
        host_graph_stats(host_edges(_links(spark)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

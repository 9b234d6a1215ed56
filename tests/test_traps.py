"""T38 — crawl-trap detection + frontier throttle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcsum_spark.frontier.traps import detect_traps, trap_gate, url_template


def _tmpl(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_template(F.col("url")).alias("t")).collect()[0]["t"]


def test_url_template_rules(spark):
    assert _tmpl(spark, "http://h.test/cal/2024/01/05") == "/cal/<n>/<n>/<n>"
    assert _tmpl(spark, "http://h.test/cal/2024/01/06") == "/cal/<n>/<n>/<n>"
    assert _tmpl(spark, "http://h.test/about") == "/about"
    # query presence is part of the template; values are not
    assert _tmpl(spark, "http://h.test/s?page=9") == "/s?"
    assert _tmpl(spark, "http://h.test/s?page=10") == "/s?"
    # no path, fragment-only
    assert _tmpl(spark, "http://h.test") == "/"
    assert _tmpl(spark, "http://h.test/p/7#frag") == "/p/<n>"


def _urls(spark):
    rows = []
    # trap host: one template generates 100 distinct URLs
    rows += [("trap.test", f"http://trap.test/d/{i}") for i in range(100)]
    # big-but-healthy host: 100 URLs over 50 letter templates
    for i in range(100):
        rows.append(
            ("big.test", f"http://big.test/s{chr(97 + i % 50)}x{chr(97 + i // 50)}")
        )
    # small host dominated by one template but below min_urls
    rows += [("small.test", f"http://small.test/d/{i}") for i in range(10)]
    return spark.createDataFrame(rows, "host string, url string")


def test_detect_traps(spark):
    out = {r["host"]: r for r in detect_traps(
        _urls(spark), min_urls=50, min_template_urls=30, min_share=0.5
    ).collect()}
    assert out["trap.test"]["is_trap"]
    assert out["trap.test"]["top_template"] == "/d/<n>"
    assert out["trap.test"]["top_urls"] == 100
    assert out["trap.test"]["top_share"] == pytest.approx(1.0)
    assert not out["big.test"]["is_trap"]  # spread over many templates
    assert out["big.test"]["n_templates"] > 30
    assert not out["small.test"]["is_trap"]  # dominated but tiny


def test_detect_traps_counts_distinct_urls(spark):
    # repeats of the same URL must not inflate the explosion signal
    rows = [("h.test", "http://h.test/d/1")] * 500
    out = detect_traps(
        spark.createDataFrame(rows, "host string, url string"),
        min_urls=50, min_template_urls=30, min_share=0.5,
    ).collect()[0]
    assert out["n_urls"] == 1 and not out["is_trap"]


def _cands(spark):
    rows = [("trap.test", f"http://trap.test/d/{i}", float(i)) for i in range(100)]
    rows += [("ok.test", f"http://ok.test/p{chr(97 + i)}", 1.0) for i in range(20)]
    return spark.createDataFrame(rows, "host string, url string, priority double")


def test_trap_gate_drop_and_throttle(spark):
    cands = _cands(spark)
    traps = detect_traps(cands, min_urls=50, min_template_urls=30, min_share=0.5)
    dropped = trap_gate(cands, traps)
    assert dropped.filter("host = 'trap.test'").count() == 0
    assert dropped.filter("host = 'ok.test'").count() == 20

    kept = trap_gate(cands, traps, keep_per_trap_host=5)
    got = kept.filter("host = 'trap.test'").select("url").collect()
    # top-5 by priority DESC survive: the highest-numbered URLs
    assert {r["url"] for r in got} == {
        f"http://trap.test/d/{i}" for i in range(95, 100)
    }
    assert kept.filter("host = 'ok.test'").count() == 20


def test_trap_gate_salted_throttle_identical(spark):
    cands = _cands(spark)
    traps = detect_traps(cands, min_urls=50, min_template_urls=30, min_share=0.5)
    plain = {tuple(r) for r in trap_gate(cands, traps, keep_per_trap_host=7).collect()}
    salted = {tuple(r) for r in trap_gate(
        cands, traps, keep_per_trap_host=7, salt_buckets=8
    ).collect()}
    assert plain == salted


def test_detect_traps_plan_is_python_free(spark):
    plan = (
        detect_traps(_urls(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_frontier_round_trap_hook(spark):
    """traps= on frontier_round: trapped hosts are not scheduled (drop)
    or scheduled at most trap_keep URLs (throttle); their URLs stay
    PENDING either way (clearing the flag later re-admits them), and an
    all-false trap table is a no-op vs no traps at all."""
    from warcsum_spark.frontier.superstep import frontier_round, init_frontier
    from warcsum_spark.frontier.traps import detect_traps

    seeds = spark.createDataFrame(
        [(f"http://trap.test/d/{i}", float(i)) for i in range(60)]
        + [(f"http://ok.test/p{chr(97 + i)}", 1.0) for i in range(6)],
        "url string, priority double",
    )
    lg = spark.createDataFrame(
        [], "url string, outlinks array<string>"
    )
    urls = seeds.selectExpr(
        "regexp_extract(url, '^https?://([^/]+)', 1) AS host", "url"
    )
    traps = detect_traps(urls, min_urls=50, min_template_urls=30, min_share=0.5)

    # drop mode
    state, sched = frontier_round(
        spark, init_frontier(spark, seeds), lg, traps=traps, default_budget=10
    )
    hosts = {r["host"] for r in sched.collect()}
    assert hosts == {"ok.test"}
    pend = {r["host"] for r in state.pending.collect()}
    assert pend == {"trap.test"}  # trapped URLs survive as pending

    # throttle mode: top trap_keep by (priority DESC, url ASC)
    state2, sched2 = frontier_round(
        spark, init_frontier(spark, seeds), lg,
        traps=traps, trap_keep=3, default_budget=10,
    )
    got = sorted(
        r["url"] for r in sched2.filter("host = 'trap.test'").collect()
    )
    assert got == [f"http://trap.test/d/{i}" for i in (57, 58, 59)]
    assert sched2.filter("host = 'ok.test'").count() == 6

    # all-false trap table == no trap argument
    no_traps = traps.selectExpr(
        "host", "n_urls", "n_templates", "top_template", "top_urls",
        "top_share", "false AS is_trap"
    )
    _, sched_a = frontier_round(
        spark, init_frontier(spark, seeds), lg, traps=no_traps, default_budget=10
    )
    _, sched_b = frontier_round(
        spark, init_frontier(spark, seeds), lg, default_budget=10
    )
    assert sorted(map(tuple, sched_a.collect())) == sorted(map(tuple, sched_b.collect()))

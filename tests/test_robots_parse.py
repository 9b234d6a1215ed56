"""robots.txt parser: grammar cases + end-to-end into the gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.frontier.robots import (
    budgets_from_crawl_delay,
    parse_robots_body,
    parse_robots_txt,
    robots_allowed,
)

BASIC = """
# comment line
User-agent: *
Disallow: /private/   # trailing comment
Allow: /private/ok
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""

MULTI_UA = """
User-agent: googlebot
User-agent: *
Disallow: /a
User-agent: otherbot
Disallow: /b
"""

NO_STAR = """
User-agent: somebot
Disallow: /x
"""

EDGE = """
User-agent: *
Disallow:
Allow: /ok
Crawl-delay: fast
disallow: /CaseField
"""


def test_parse_basic():
    rules, delay = parse_robots_body(BASIC)
    assert rules == [(False, "/private/"), (True, "/private/ok")]
    assert delay == 2.5


def test_parse_multi_ua_group_and_group_reset():
    rules, delay = parse_robots_body(MULTI_UA)
    # '*' shares the first group; otherbot's group after directives is a
    # NEW group that does not contain '*'
    assert rules == [(False, "/a")]
    assert delay is None


def test_parse_no_star_group_allows_everything():
    assert parse_robots_body(NO_STAR) == ([], None)


def test_parse_edge_cases():
    rules, delay = parse_robots_body(EDGE)
    # empty Disallow is a no-op; bad Crawl-delay ignored; field names are
    # case-insensitive
    assert rules == [(True, "/ok"), (False, "/CaseField")]
    assert delay is None
    assert parse_robots_body(None) == ([], None)
    assert parse_robots_body(b"User-agent: *\nDisallow: /b\xff") == (
        [(False, "/b�")],
        None,
    )


def test_parse_to_gate_end_to_end(spark):
    fetched = spark.createDataFrame(
        [("h1.test", BASIC), ("h2.test", NO_STAR)], "host string, body string"
    )
    robots = parse_robots_txt(fetched)
    cand = spark.createDataFrame(
        [
            ("http://h1.test/private/x", "h1.test"),
            ("http://h1.test/private/ok/page", "h1.test"),
            ("http://h1.test/open", "h1.test"),
            ("http://h2.test/x/anything", "h2.test"),
            ("http://nofile.test/y", "nofile.test"),
        ],
        "url string, host string",
    )
    got = {
        r["url"]
        for r in robots_allowed(cand, robots.select("host", "rules")).collect()
    }
    assert got == {
        "http://h1.test/private/ok/page",
        "http://h1.test/open",
        "http://h2.test/x/anything",
        "http://nofile.test/y",
    }

    budgets = {
        r["host"]: r["budget"]
        for r in budgets_from_crawl_delay(robots, window_sec=60).collect()
    }
    assert budgets == {"h1.test": 24, "h2.test": 10}  # 60/2.5=24; default 10


def test_parse_udf_matches_python(spark):
    bodies = [BASIC, MULTI_UA, NO_STAR, EDGE, None, ""]
    df = spark.createDataFrame(
        [(f"h{i}.test", b) for i, b in enumerate(bodies)],
        "host string, body string",
    )
    rows = {r["host"]: r for r in parse_robots_txt(df).collect()}
    for i, b in enumerate(bodies):
        expect_rules, expect_delay = parse_robots_body(b)
        r = rows[f"h{i}.test"]
        got_rules = [(x["allow"], x["prefix"]) for x in r["rules"]]
        assert got_rules == expect_rules, i
        assert r["crawl_delay"] == expect_delay, i

def test_crawl_delay_longer_than_window_gets_zero_budget(spark):
    """A host declaring Crawl-delay > window must be SKIPPED this window
    (budget 0) — the old >=1 floor granted up to delay/window times the
    declared rate."""
    robots = spark.createDataFrame(
        [
            ("slow.test", 3600.0),   # 1 fetch/hour: no fetch in a 60s window
            ("exact.test", 60.0),    # delay == window: exactly 1
            ("fast.test", 2.5),      # 24 per window
            ("none.test", None),     # default budget
        ],
        "host string, crawl_delay double",
    )
    budgets = {
        r["host"]: r["budget"]
        for r in budgets_from_crawl_delay(robots, window_sec=60).collect()
    }
    assert budgets == {
        "slow.test": 0, "exact.test": 1, "fast.test": 24, "none.test": 10
    }


def test_robots_sitemaps_extraction(spark):
    from warcsum_spark.frontier.robots import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.test/sitemap.xml\n"
        "# comment line\n"
        "  SITEMAP:\thttp://a.test/sm2.xml # trailing comment\n"
        "Sitemap:\n"  # empty value -> dropped
        "NotSitemap: http://a.test/no.xml\n"
    )
    df = spark.createDataFrame(
        [("a.test", body), ("b.test", None), ("c.test", "")],
        "host string, body string",
    )
    rows = {(r["host"], r["sitemap_url"]) for r in robots_sitemaps(df).collect()}
    assert rows == {
        ("a.test", "http://a.test/sitemap.xml"),
        ("a.test", "http://a.test/sm2.xml"),
    }
    plan = robots_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_fetch_robots_over_loopback(spark):
    """The robots table no longer arrives from nowhere: hosts →
    GET /robots.txt over real sockets → rules + Crawl-delay budgets →
    the gate; an unreachable host parses as all-allowed (RFC 9309
    §2.3.1 unavailability)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from warcsum_spark.frontier.robots import (
        budgets_from_crawl_delay,
        fetch_robots,
        robots_allowed,
    )
    from warcsum_spark.sources.fetch import HttpRangeFetcher

    body = b"User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 5\n"

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path != "/robots.txt":
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        live = f"127.0.0.1:{port}"
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        dead = f"127.0.0.1:{s.getsockname()[1]}"
        s.close()

        hosts = spark.createDataFrame([(live,), (dead,)], "host string")
        robots = fetch_robots(hosts, lambda: HttpRangeFetcher(timeout=10))
        rows = {r["host"]: r for r in robots.collect()}
        assert [dict(x.asDict()) for x in rows[live]["rules"]] == [
            {"allow": False, "prefix": "/private"},
            {"allow": True, "prefix": "/private/ok"},
        ]
        assert rows[live]["crawl_delay"] == 5.0
        assert list(rows[dead]["rules"]) == []  # unreachable → all allowed
        assert rows[dead]["crawl_delay"] is None

        budgets = {
            r["host"]: r["budget"]
            for r in budgets_from_crawl_delay(robots, window_sec=60).collect()
        }
        assert budgets[live] == 12  # floor(60/5)
        assert budgets[dead] == 10  # default

        cands = spark.createDataFrame(
            [
                (f"http://{live}/private/x", live),
                (f"http://{live}/private/ok/x", live),
                (f"http://{live}/public", live),
                (f"http://{dead}/anything", dead),
            ],
            "url string, host string",
        )
        got = {
            r["url"]
            for r in robots_allowed(
                cands, robots.select("host", "rules")
            ).collect()
        }
        assert got == {
            f"http://{live}/private/ok/x",
            f"http://{live}/public",
            f"http://{dead}/anything",
        }
    finally:
        srv.shutdown()
        srv.server_close()

"""R4 — robots.txt gating, fully JVM-side, plus the raw-file parser.

Rules table: ``robots(host string, rules array<struct<allow boolean,
prefix string>>)`` — small dimension (one row per host with rules),
broadcast-joined onto candidates. The longest-prefix-match winner
(Google robots semantics, simplified to literal prefixes; no rules →
allowed) is computed with ``F.aggregate`` over the rules array — a codegen
expression, no Python worker anywhere in the gate.

``parse_robots_txt`` turns fetched raw robots.txt bodies into that rules
table (RFC 9309 simplified: comment stripping, ``User-agent`` grouping,
``*``-group Allow/Disallow in document order, ``Crawl-delay``). The parse
is an Arrow-batched pandas UDF — robots bodies are small and the grammar
is line-stateful, the one shape vectorized string kernels don't fit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warcsum_spark.functions.urls import url_path_query

_RULES_TYPE = T.StructType(
    [
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("allow", T.BooleanType()),
                        T.StructField("prefix", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def parse_robots_body(body) -> tuple[list[tuple[bool, str]], float | None]:
    """One robots.txt body → ([(allow, prefix) in document order],
    crawl_delay seconds or None), honoring every group whose User-agent
    set contains ``*`` (we crawl as a generic agent). Mirrors
    RFC 9309 §2.2: comments start at '#'; a blank line does NOT end a
    group, a new ``User-agent`` after directives starts one; an empty
    Disallow value is a no-op rule. Null body → no rules (allow all)."""
    if body is None:
        return [], None
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", "replace")
    rules: list[tuple[bool, str]] = []
    delay = None
    uas: list[str] = []
    in_directives = False
    star = False
    for raw in str(body).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_directives:  # new group starts
                uas, star, in_directives = [], False, False
            uas.append(value)
            star = star or value == "*"
            continue
        in_directives = True
        if not star:
            continue
        if field == "allow" and value:
            rules.append((True, value))
        elif field == "disallow" and value:
            rules.append((False, value))
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return rules, delay


@F.pandas_udf(_RULES_TYPE)
def _parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    out_rules, out_delay = [], []
    for b in bodies:
        r, d = parse_robots_body(b)
        out_rules.append([{"allow": a, "prefix": p} for a, p in r])
        out_delay.append(d)
    return pd.DataFrame({"rules": out_rules, "crawl_delay": out_delay})


def parse_robots_txt(
    fetched: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body string|binary) → the gate's rules table
    (host, rules, crawl_delay). Feed ``select("host", "rules")`` to
    ``robots_allowed`` and ``crawl_delay`` to ``budgets_from_crawl_delay``."""
    parsed = fetched.select(
        F.col(host_col).alias("host"), _parse_robots_udf(F.col(body_col)).alias("_p")
    )
    return parsed.select(
        "host",
        F.col("_p.rules").alias("rules"),
        F.col("_p.crawl_delay").alias("crawl_delay"),
    )


def budgets_from_crawl_delay(
    robots: DataFrame, window_sec: float = 60.0, default_budget: int = 10
) -> DataFrame:
    """Politeness budgets (host, budget) from Crawl-delay: at most
    floor(window/delay) fetches per scheduling window, default where no
    delay is declared. A host declaring Crawl-delay LONGER than the window
    gets budget 0 — it must be skipped this window (granting the old ≥1
    floor would fetch up to delay/window times the declared rate); the
    scheduler picks it up in a later window. For delay ≤ window the floor
    is ≥1 arithmetically. Broadcast-sized — one row per host."""
    return robots.select(
        "host",
        F.when(
            F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
            F.when(F.col("crawl_delay") > window_sec, F.lit(0)).otherwise(
                F.floor(F.lit(window_sec) / F.col("crawl_delay"))
            ),
        )
        .otherwise(F.lit(default_budget))
        .cast("int")
        .alias("budget"),
    )


def robots_allowed(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter candidates (url=canonical, host) to robots-allowed rows.

    Equal-length allow/disallow ties resolve to ALLOW (RFC 9309 §2.2.2 /
    Google robots semantics), matching oracle.robots_allows."""
    joined = candidates.join(F.broadcast(robots), "host", "left")
    path = url_path_query(F.col("url"))
    init = F.struct(
        F.lit(-1).alias("blen"), F.lit(True).alias("allow")
    )
    best = F.aggregate(
        F.coalesce(F.col("rules"), F.array()),
        init,
        lambda acc, r: F.when(
            path.startswith(r["prefix"])
            & (
                (F.length(r["prefix"]) > acc["blen"])
                | ((F.length(r["prefix"]) == acc["blen"]) & r["allow"])
            ),
            F.struct(F.length(r["prefix"]).alias("blen"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return joined.withColumn("_allowed", best["allow"]).filter(F.col("_allowed")).drop(
        "_allowed", "rules"
    )


def robots_sitemaps(
    fetched: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — the ``Sitemap:`` lines of each robots.txt
    body. Per RFC 9309 §2.3 these are NOT group-scoped (they apply
    regardless of User-agent groups), so this is a pure JVM
    ``regexp_extract_all`` over the raw body — no state machine, no
    Python — feeding frontier/sitemap.py for seed expansion. Comments
    (#...) and surrounding whitespace are stripped; field name is
    case-insensitive per the RFC."""
    pat = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t\r\n#]+)"
    urls = F.regexp_extract_all(
        F.col(body_col).cast("string"), F.lit(pat), F.lit(1)
    )
    return (
        fetched.select(
            F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
        ).filter(F.col("sitemap_url") != "")
    )


def fetch_robots(
    hosts: DataFrame,
    fetcher_factory,
    host_col: str = "host",
    scheme: str = "http",
) -> DataFrame:
    """Production seam closure: (host) → GET {scheme}://host/robots.txt
    through the standard fetch stage → the gate's (host, rules,
    crawl_delay) table. A 404/unreachable robots.txt parses as the
    empty rule set (everything allowed, RFC 9309 §2.3.1 unavailability
    rule) with no Crawl-delay — the fetch failure is policy, not an
    error. Hosts are dimension-grain, so this is one small fetch round
    per scheduling window, not per URL."""
    from warcsum_spark.sources.fetch import fetch_pages

    urls = hosts.select(
        F.col(host_col).alias("host"),
        F.concat(
            F.lit(f"{scheme}://"), F.col(host_col), F.lit("/robots.txt")
        ).alias("url"),
    )
    fetched = fetch_pages(urls, fetcher_factory).join(
        urls, "url"
    )
    body = F.when(
        F.col("status").between(200, 299), F.col("body").cast("string")
    ).otherwise(F.lit(""))  # unavailable → empty rules → all allowed
    return parse_robots_txt(fetched.select("host", body.alias("body")))

"""T67 — URL path-template mining: the infinite-URL-space detector.

DUST rules (T45) prove which QUERY PARAMETERS don't matter; calendar
traps, session-id paths, and auto-generated archives live in the PATH:
``/2024/01/03/``, ``/product/839122/``, ``/s/ab3f9c02d41e/``. Collapse
every path segment that is a number, a long hex token, or a long opaque
slug into a typed wildcard and count URLs per (host, template): a
template whose URL count keeps growing crawl-over-crawl while its
content digests don't change is a trap or an unbounded listing — the
standard frontier-hygiene signal (Common Crawl and Heritrix both ship
path-pattern budgets; cf. the "calendar trap" in Heritrix docs and
Bar-Yossef et al.'s DUST framing).

Segment rules, applied in FIXED order (first match wins), chosen to be
RE2-safe so the DuckDB twin runs the same patterns (no lookbehind):

    ^[0-9]+$            → {d}   (numeric id / date part)
    ^[0-9a-f]{8,}$      → {h}   (hex id / content hash)
    ^[A-Za-z0-9_-]{12,}$ → {r}  (opaque slug / session token)

Plan shape at 100 TB: template derivation is map-only array work over
the split path (one pass, no UDF); the count is ONE exchange keyed
(host, template) with map-side combine — URL strings reduce to their
template before shuffling; only (host, template, count, min-url
sample) rows move. Skewed hosts are fine: the key carries the template
so one host fans across its templates, and AQE handles residual skew.

No reference counterpart (warcsum has no frontier); concepts public
(Bar-Yossef et al. WWW 2007; Heritrix crawl-trap documentation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) in match order — RE2-safe, shared with the twin
SEGMENT_RULES: list[tuple[str, str]] = [
    (r"^[0-9]+$", "{d}"),
    (r"^[0-9a-f]{8,}$", "{h}"),
    (r"^[A-Za-z0-9_-]{12,}$", "{r}"),
]


def path_template(path: Column) -> Column:
    """Collapse each '/'-segment of a path by SEGMENT_RULES; the query
    string must already be stripped. Map-only array expressions."""

    def _seg(s: Column) -> Column:
        out = None
        for pat, rep in SEGMENT_RULES:
            cond = s.rlike(pat)
            out = F.when(cond, F.lit(rep)) if out is None else out.when(
                cond, F.lit(rep)
            )
        return out.otherwise(s)

    return F.array_join(F.transform(F.split(path, "/"), _seg), "/")


def mine_url_templates(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 2,
) -> DataFrame:
    """(host, template, n_urls, sample_url) for every path template
    with at least ``min_urls`` distinct URLs — ordered nowhere (let the
    caller sort); input URLs are de-duplicated first. Expects
    canonical-shaped URLs (``scheme://host[:port]/path[?query]``)."""
    from warcsum_spark.functions.urls import (
        url_host_canonical,
        url_path_query,
    )

    u = urls.select(F.col(url_col).alias("url")).distinct()
    path = F.substring_index(url_path_query(F.col("url")), "?", 1)
    per = u.select(
        "url",
        url_host_canonical(F.col("url")).alias("host"),
        path_template(path).alias("template"),
    )
    return (
        per.groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("url").alias("sample_url"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )


def templates_oracle_sql(
    urls_cte: str,
    min_urls: int = 2,
) -> str:
    """The identical mining in DuckDB; ``urls_cte`` yields (url,).
    Host/path extraction assumes the same canonical shape (no IPv6 —
    the Spark side's bracket branch has no RE2-safe twin and the gate
    corpus is synthetic)."""
    rules = " ".join(
        f"WHEN regexp_matches(x, '{pat}') THEN '{rep}'"
        for pat, rep in SEGMENT_RULES
    )
    return f"""
WITH u AS (SELECT DISTINCT url FROM ({urls_cte})),
per AS (
  SELECT url,
         split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1)
           AS host,
         array_to_string(
           list_transform(
             string_split(
               split_part(regexp_replace(url, '^[a-z]+://[^/]*', ''),
                          '?', 1),
               '/'),
             x -> CASE {rules} ELSE x END),
           '/') AS template
  FROM u
)
SELECT host, template, count(*) AS n_urls, min(url) AS sample_url
FROM per
GROUP BY host, template
HAVING count(*) >= {min_urls}
"""

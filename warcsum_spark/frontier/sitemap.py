"""Sitemap ingestion for frontier seeding — parse sitemap.xml /
sitemap-index.xml bodies into (url, lastmod, priority) seed rows, the
discovery channel robots.txt points crawlers at (RFC 9309 `Sitemap:`
lines; sitemaps.org protocol).

Spark-first: a sitemap is a flat sequence of ``<url>``/``<sitemap>``
elements with simple-text children, so extraction is a pure JVM
``regexp_extract_all`` chain over the body column — no XML library, no
Python, fuses into the scan. This deliberately parses the PROTOCOL
SUBSET (loc/lastmod/priority simple elements, no namespaces-dependent
attributes), which is what the sitemaps.org schema defines; entities in
``<loc>`` are decoded per the protocol's escaping rules (&amp; &lt;
&gt; &quot; &apos; — the five XML built-ins).

Patterns stay in the RE2 ∩ java.util.regex common subset (explicit
classes, non-greedy, no lookaround) so the driver's DuckDB oracle can
run the identical extraction.

Scale shape: one body row in → tens of thousands of URL rows out via
``posexplode``; the parse itself is map-only. Feed the output through
``canonicalize_url`` → URL-seen gate → politeness (the existing
frontier chain) rather than trusting it raw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <loc> ... </loc> inside a <url> or <sitemap> element; sitemaps.org
# requires simple text content. [\s\S] spelled as an explicit class.
_ELEM = r"<{tag}[ \t\r\n]*>[ \t\r\n]*([^<]*?)[ \t\r\n]*</{tag}[ \t\r\n]*>"

URL_BLOCK_RE = r"(?s)<url[ \t\r\n]*>(.*?)</url[ \t\r\n]*>"
SITEMAP_BLOCK_RE = r"(?s)<sitemap[ \t\r\n]*>(.*?)</sitemap[ \t\r\n]*>"


def _xml_unescape(c: Column) -> Column:
    """The five XML built-in entities, &amp; last (protocol order)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _child(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block, _ELEM.format(tag=tag), 1)
    return F.when(got == "", None).otherwise(_xml_unescape(got))


def parse_sitemap(
    df: DataFrame,
    body_col: str = "body",
    source_col: str = "sitemap_url",
) -> DataFrame:
    """(source_col, entry_idx, url, lastmod, priority) — one row per
    ``<url>`` entry; entries with an empty/missing ``<loc>`` are
    dropped (nothing to fetch). ``priority`` is a double, null when
    absent or non-numeric."""
    blocks = F.expr(
        f"regexp_extract_all({body_col}, '{URL_BLOCK_RE}', 1)"
    )
    exploded = df.select(
        F.col(source_col), F.posexplode(blocks).alias("entry_idx", "_block")
    )
    out = exploded.select(
        source_col,
        "entry_idx",
        _child(F.col("_block"), "loc").alias("url"),
        _child(F.col("_block"), "lastmod").alias("lastmod"),
        # try_cast: a junk <priority> is null, not an ANSI cast error
        _child(F.col("_block"), "priority")
        .try_cast("double")
        .alias("priority"),
    )
    return out.filter(F.col("url").isNotNull())


def sitemap_index_children(
    df: DataFrame, body_col: str = "body", source_col: str = "sitemap_url"
) -> DataFrame:
    """(source_col, child_url) — the nested sitemaps a sitemap-index
    points at; the crawl loop fetches these and feeds their bodies back
    through parse_sitemap (one round per nesting level, and the
    protocol caps nesting)."""
    blocks = F.expr(
        f"regexp_extract_all({body_col}, '{SITEMAP_BLOCK_RE}', 1)"
    )
    out = df.select(
        F.col(source_col), F.explode(blocks).alias("_block")
    ).select(source_col, _child(F.col("_block"), "loc").alias("child_url"))
    return out.filter(F.col("child_url").isNotNull())


def sitemap_seeds(
    df: DataFrame,
    body_col: str = "body",
    source_col: str = "sitemap_url",
    default_priority: float = 0.5,
) -> DataFrame:
    """(url, priority) seed rows for ``init_frontier`` — the seed-source
    hook that plugs sitemap bodies into the crawl loop. An absent or
    junk ``<priority>`` takes the sitemaps.org protocol default (0.5);
    the same ``<loc>`` appearing in several sitemaps collapses to its
    max priority (init_frontier re-applies the same set semantics after
    canonicalization, so pre-collapsing here just slims the union)."""
    entries = parse_sitemap(df, body_col=body_col, source_col=source_col)
    return (
        entries.select(
            "url",
            F.coalesce("priority", F.lit(float(default_priority))).alias("priority"),
        )
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
    )

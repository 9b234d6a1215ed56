"""T33 — anchor-text extraction + aggregation: what the web calls a
page is a crawl-ranking and indexing signal (anchor text describes the
TARGET, often better than the target's own words — classic web-search
practice). Pairs (target href, anchor text) come out of the stored
pages; aggregation produces per-target reference counts and the top
anchor variants.

Spark-first: extraction is TWO JVM ``regexp_extract_all`` calls over
the same pattern (capture group 1 = href, group 2 = anchor text),
zipped positionally — both calls see the identical match list, so the
zip is alignment-safe, and the whole parse fuses into the scan with no
Python. Like sitemap.py, this parses the PROTOCOL SUBSET: simple-text
anchors (``<a href="...">text</a>`` with no nested markup); anchors
whose body contains nested tags are skipped. The pattern stays in
the RE2 ∩ java.util.regex common subset so the DuckDB oracle runs the
identical extraction.

Aggregation shape at 100 TB: one exchange keyed (href, anchor) with
map-side partial aggregation (hot targets collapse hardest), then the
top-k window runs on the AGGREGATED pair counts — distinct-pair grain,
orders of magnitude smaller than the raw anchor stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# group 1 = href, group 2 = simple-text anchor. Explicit classes,
# non-greedy, no lookaround: Java regex ∩ RE2 ∩ DuckDB.
ANCHOR_PATTERN = (
    r"""(?is)<a[^>]*?href[ \t\r\n]*=[ \t\r\n]*["']([^"'<>]+)["'][^>]*>([^<]*)</a"""
)


def anchor_pairs(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, href, anchor) — one row per <a> occurrence, document order,
    hrefs raw (the frontier canonicalizes downstream), anchor text
    whitespace-trimmed."""
    pat = ANCHOR_PATTERN.replace("'", "\\'")
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)")
    texts = F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)")
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor"))).alias(
                "z"
            ),
        )
        .select("url", F.col("z.href").alias("href"), F.trim("z.anchor").alias("anchor"))
    )


def aggregate_anchor_text(pairs: DataFrame, k: int = 3) -> DataFrame:
    """(href, n_refs, rank, anchor, cnt): per-target total reference
    count and the top-``k`` anchor variants by (count DESC, anchor ASC —
    deterministic). Flat rows, not nested arrays: directly comparable
    across engines and trivially re-aggregated by consumers."""
    from pyspark.sql import Window

    counts = pairs.groupBy("href", "anchor").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("href").agg(F.sum("cnt").alias("n_refs"))
    w = Window.partitionBy("href").orderBy(F.desc("cnt"), F.asc("anchor"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return ranked.join(totals, "href").select(
        "href", "n_refs", "rank", "anchor", "cnt"
    )

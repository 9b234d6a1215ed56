"""T41 — host-level web-graph aggregation: collapse the page-level link
graph to (src_host, dst_host) edges and derive per-host connectivity
statistics (in/out degree, link volumes, reciprocity). The host graph
is the workhorse granularity of crawl engineering — seed selection,
spam-farm detection (abnormal reciprocity), politeness grouping, and
host-level PageRank (operators/pagerank.py consumes these edges
directly) all run at host grain because the page graph is 3–4 orders
of magnitude larger.

Plan shape at 100 TB:

* page edges → host edges is ONE exchange keyed on
  (src_host, dst_host) with map-side combine — the heavy page-URL
  strings are reduced to host pairs in the map stage and never
  reshuffle;
* every statistic after that runs on the HOST-EDGE table, which is
  dimension-sized (hosts × mean-degree; ~10^8 rows for the full web,
  trivially for any crawl slice);
* reciprocity is a self-join of that dimension table on the reversed
  key — never of the page-level stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _host(url: Column) -> Column:
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    return F.lower(F.regexp_extract(rest, r"^([^/:]+)", 1))


def host_edges(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_self_loops: bool = False,
) -> DataFrame:
    """(src_host, dst_host, n_links) — page-level links collapsed to
    host grain. Self-loops (intra-host navigation, the bulk of most
    sites' links) are dropped by default: connectivity statistics are
    about the BETWEEN-host structure."""
    edges = links.select(
        _host(F.col(src_col)).alias("src_host"),
        _host(F.col(dst_col)).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_self_loops:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def host_graph_stats(edges: DataFrame) -> DataFrame:
    """(host, out_degree, in_degree, out_links, in_links, reciprocal,
    reciprocity) from a host-edge table: degrees count distinct
    neighbor hosts, link columns sum page-level volumes, ``reciprocal``
    counts out-neighbors that link back, and ``reciprocity`` =
    reciprocal/out_degree (NULL for hosts with no outgoing edges —
    pure sinks). A healthy site links out asymmetrically; a link farm's
    reciprocity saturates."""
    # cached: three branches (reversed-edge set, out side, in side)
    # consume the host-edge table — uncached each re-runs the page→host
    # collapse over the full link stream; host-grain rows, tiny
    edges = edges.cache()
    back = edges.select(
        F.col("src_host").alias("dst_host"),
        F.col("dst_host").alias("src_host"),
        F.lit(1).alias("_back"),
    ).distinct()
    out_side = (
        edges.join(back, ["src_host", "dst_host"], "left")
        .groupBy(F.col("src_host").alias("host"))
        .agg(
            F.count("*").alias("out_degree"),
            F.sum("n_links").alias("out_links"),
            F.count("_back").alias("reciprocal"),
        )
    )
    in_side = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_degree"),
        F.sum("n_links").alias("in_links"),
    )
    return (
        out_side.join(in_side, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
            F.coalesce("reciprocal", F.lit(0)).alias("reciprocal"),
            F.round(F.col("reciprocal") / F.col("out_degree"), 6).alias(
                "reciprocity"
            ),
        )
    )

"""The ``web_pages`` table (input_hint schema: url, warc_ts, html, text,
lang) — loaders plus the S6/S7 replacements.

Production target is an Iceberg table (`spark.read.table("web_pages")`,
partition pruning on host-hash buckets, column pruning keeps ``html``
unread in frontier-only rounds); the parquet path below is the sandbox
equivalent with the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_web_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def resolve_mirror_urls(manifest: DataFrame, path_index: DataFrame) -> DataFrame:
    """S6 (warccollres.c:299–352): the per-record MySQL point query
    ``SELECT url FROM path_index WHERE filename=…`` becomes ONE broadcast
    hash join; mirror multiplicity (warccollres.c:330–352) is pre-collapsed
    to an ordered array, so failover order is deterministic."""
    mirrors = path_index.groupBy("filename").agg(
        F.sort_array(F.collect_list("url")).alias("mirror_urls")
    )
    return manifest.join(
        F.broadcast(mirrors),
        manifest.warcfile == mirrors.filename,
        "left",
    ).drop("filename")


def attach_payloads(manifest: DataFrame, pages: DataFrame, key: str = "uri") -> DataFrame:
    """S7 replacement: warccollres re-downloads member bytes per record via
    HTTP range GET (warccollres.c:663–781); with payloads stored columnar,
    re-attaching them is an equi-join on the record key — one shuffle,
    no network round-trips, and Catalyst prunes every unused page column."""
    payloads = pages.select(F.col("url").alias(key), F.col("html").alias("payload"))
    return manifest.join(payloads, key, "left")

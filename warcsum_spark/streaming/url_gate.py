"""Continuous URL-ingest gate — the frontier's admission path lifted
onto Structured Streaming: discovered links arrive as a firehose
(outlink extraction, sitemap pings, submissions), and each URL is
canonicalized, blocklist-gated, and robots-gated AS IT LANDS instead of
in a batch sweep before every round.

Statefulness audit (what makes this streamable as-is):

* canonicalization — pure per-row (Arrow UDF + JVM fast path);
* blocklist — per-row JVM predicate (inline mode) over the parent-
  domain expansion;
* robots — a stream-STATIC join: the rules table is a bounded
  dimension refreshed out-of-band (frontier/robots.fetch_robots), and
  Structured Streaming supports static-side joins natively.

The one genuinely stateful admission step — the URL-seen set — already
has its streaming form (streaming/seen_stream.py,
``applyInPandasWithState``); chain it downstream of this gate for the
full admission path. Batch/stream parity is pinned in tests on exactly
the shared column function, same idiom as quality_stream.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_URL_SCHEMA = T.StructType(
    [
        T.StructField("raw_url", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
    ]
)


def gated_url_columns(
    df: DataFrame,
    blocked_domains: Sequence[str] = (),
    block_patterns: Sequence[str] = (),
    robots: DataFrame | None = None,
    raw_col: str = "raw_url",
) -> DataFrame:
    """(url, host, priority): canonicalized survivors of the blocklist
    and robots gates. Identical on batch and streaming frames — parity
    is pinned on this exact function."""
    from warcsum_spark.frontier.blocklist import blocklist_gate
    from warcsum_spark.frontier.robots import robots_allowed
    from warcsum_spark.functions.urls import canonicalize_url, url_host_canonical

    out = (
        df.select(
            canonicalize_url(F.col(raw_col)).alias("url"),
            F.col("priority"),
        )
        .filter(F.col("url").isNotNull())
        .withColumn("host", url_host_canonical(F.col("url")))
    )
    if blocked_domains or block_patterns:
        out = blocklist_gate(
            out, list(blocked_domains), url_patterns=tuple(block_patterns)
        )
    if robots is not None:
        out = robots_allowed(out, robots)
    return out.select("url", "host", "priority")


def stream_url_gate(
    spark: SparkSession,
    input_dir: str,
    blocked_domains: Sequence[str] = (),
    block_patterns: Sequence[str] = (),
    robots: DataFrame | None = None,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming admission gate over a parquet directory source of
    (raw_url, priority) rows."""
    raw = (
        spark.readStream.schema(RAW_URL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return gated_url_columns(
        raw,
        blocked_domains=blocked_domains,
        block_patterns=block_patterns,
        robots=robots,
    )

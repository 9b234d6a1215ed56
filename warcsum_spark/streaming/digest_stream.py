"""Continuous-ingest variant of stage 1 (SURVEY §2.9).

The digest stage is stateless per row, so it lifts directly onto
Structured Streaming: a file-source stream of ``web_pages``-shaped parquet
(or a Kafka source in production) → the same ``digest_manifest`` plan →
an append sink — new archives landing in the input directory stream
straight into manifest rows exactly once per file. The crawl's primary
URL-seen set stays in the batch superstep loop (Iceberg-backed); the
streaming-side stateful counterpart (first-seen across micro-batches via
``applyInPandasWithState``) lives in ``streaming/seen_stream.py``.

The reference has no streaming counterpart at all (pure batch,
warccollres.c:1241's line loop included); this module exists because a
100 TB crawl ingests continuously and re-running batch stage 1 over the
full archive set per delivery would be O(corpus) instead of O(delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from warcsum_spark.functions.digests import digest_hex

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_digest_manifest(
    spark: SparkSession,
    input_dir: str,
    algo: str = "sha1",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming DataFrame of digest-manifest rows from a web_pages
    parquet directory source (input_hint schema)."""
    pages = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    return pages.select(
        F.col("url").alias("uri"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("date"),
        F.length("html").cast("long").alias("length"),
        F.concat(F.lit(algo + ":"), digest_hex(F.col("html"), algo)).alias("digest"),
    )


def start_digest_sink(
    manifest_stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Exactly-once append sink (file-source offsets + sink commit log)."""
    return (
        manifest_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )

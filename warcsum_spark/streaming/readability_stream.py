"""Continuous-ingest readability scoring — T89's battery lifted onto
Structured Streaming.

The readability battery (functions/readability.py) is a stateless
row-local projection — higher-order expressions over the split word
array, no aggregation, no state — so the identical column expressions
bolt onto a streaming source unchanged (the quality_stream.py
statelessness discipline: one plan, two execution modes, pinned by a
stream == batch test rather than assumed).

Production shape: web_pages parquet/Kafka source → Flesch/FK/fog
columns → append sink; downstream mixture recipes bucket on the scores
exactly like they bucket on T78's perplexity terciles, without
re-scanning the corpus per training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from warcsum_spark.streaming.digest_stream import WEB_PAGES_SCHEMA


def readability_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """url + the full T89 battery — identical on batch and streaming
    frames; callers pin stream == batch on exactly this function."""
    from warcsum_spark.functions.readability import readability

    return readability(
        df.select("url", text_col), text_col=text_col, id_cols=["url"]
    )


def stream_readability(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming DataFrame of (url, n_words, n_sentences, n_syllables,
    n_complex_words, flesch_reading_ease, fk_grade, gunning_fog) from a
    parquet directory source."""
    pages = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    return readability_columns(pages)

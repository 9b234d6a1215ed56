"""Continuous-ingest quality gating — the training-data filter battery
lifted onto Structured Streaming.

Every gate in the round-3 filter family is STATELESS per row (Gopher
rule battery, hashed-linear model score, repetition array tier, script
profile), so the same column expressions that run in the batch pipeline
bolt onto a streaming source unchanged — one plan, two execution modes.
That statelessness is a design property worth pinning with a test, not
an accident: the one repetition signal that is NOT row-local in its
relational form (top-n-gram char fraction) has a per-row kernel
(functions/repetition.py::_top_ngram_kernel) precisely so the battery
stays streamable.

Production shape: web_pages parquet/Kafka source → quality + model +
repetition + script columns → filter → append sink; a 100 TB crawl
gates documents as they land instead of re-scanning the corpus per
training run. Corpus-RELATIVE passes (paragraph dedup, mixing,
packing) stay in the batch layer by nature — they need cross-document
state and run on the gated store downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from warcsum_spark.streaming.digest_stream import WEB_PAGES_SCHEMA


def gated_columns(
    df: DataFrame, text_col: str = "text", bounds: dict | None = None
) -> DataFrame:
    """The full stateless gate battery as columns + the combined
    ``gate_keep``. Works identically on a batch or streaming frame —
    callers pin stream == batch on exactly this function."""
    from pyspark.sql import functions as F

    from warcsum_spark.functions.quality import with_quality_rules
    from warcsum_spark.functions.scripts import with_script_profile
    from warcsum_spark.operators.classify import classify_quality

    out = with_quality_rules(df, text_col=text_col, bounds=bounds)
    out = classify_quality(out, text_col=text_col)
    out = with_script_profile(out, text_col=text_col)
    return out.withColumn(
        "gate_keep", F.col("keep") & F.col("model_keep")
    )


def stream_quality_gate(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 8,
    bounds: dict | None = None,
) -> DataFrame:
    """Streaming DataFrame of gated web_pages rows (survivors only,
    original columns + model_score) from a parquet directory source."""
    from pyspark.sql import functions as F

    pages = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    gated = gated_columns(pages, bounds=bounds)
    return gated.filter(F.col("gate_keep")).select(
        *[f.name for f in WEB_PAGES_SCHEMA.fields], "model_score"
    )

"""T56 — crawl snapshot diff: classify every URL across two crawl
batches as added / removed / changed / unchanged by content digest.
This is the incremental-crawl workhorse between warcsum's digest
manifests (warcsum.h:23–30 grain: one digest per fetched member) and
the recrawl scheduler (operators/recrawl.py consumes change histories;
this op produces one history step). CDX delta accounting, freshness
dashboards, and "what do we re-extract this cycle" pipelines all start
from exactly this frame.

Plan shape at 100 TB: ONE full-outer hash join keyed on url, each side
carrying (url, digest) only — payloads and text never enter the plan;
both sides arrive pre-aggregated to one row per URL (latest capture)
via a max_by that shares the same url-keyed exchange. The status
column is a codegen'd CASE over null-ness and digest equality; the
summary is a dimension-sized groupBy over the 4 statuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _latest(df: DataFrame, url_col: str, digest_col: str, ts_col: str | None):
    """One row per URL: the digest of the latest capture (ties on
    timestamp break to the max digest — deterministic under recrawl
    races), or a plain dedup when no timestamp column is given."""
    if ts_col is None:
        return df.groupBy(F.col(url_col).alias("url")).agg(
            F.max(digest_col).alias("digest")
        )
    return df.groupBy(F.col(url_col).alias("url")).agg(
        F.max_by(
            F.col(digest_col), F.struct(F.col(ts_col), F.col(digest_col))
        ).alias("digest")
    )


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    ts_col: str | None = None,
) -> DataFrame:
    """(url, status, prev_digest, cur_digest) for every URL in either
    snapshot: ``added`` (cur only), ``removed`` (prev only),
    ``changed`` (both, digests differ), ``unchanged`` (both, equal)."""
    p = _latest(prev, url_col, digest_col, ts_col).withColumnRenamed(
        "digest", "prev_digest"
    )
    c = _latest(cur, url_col, digest_col, ts_col).withColumnRenamed(
        "digest", "cur_digest"
    )
    joined = p.join(c, "url", "full_outer")
    status = (
        F.when(F.col("prev_digest").isNull(), F.lit("added"))
        .when(F.col("cur_digest").isNull(), F.lit("removed"))
        .when(F.col("prev_digest") == F.col("cur_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select("url", status.alias("status"), "prev_digest", "cur_digest")


def diff_stats(diff: DataFrame) -> DataFrame:
    """(status, n_urls) — the four-row summary a recrawl budget reads."""
    return diff.groupBy("status").agg(F.count("*").alias("n_urls"))

"""R4 — robots.txt gating, fully JVM-side.

Rules table: ``robots(host string, rules array<struct<allow boolean,
prefix string>>)`` — small dimension (one row per host with rules),
broadcast-joined onto candidates. The longest-prefix-match winner
(Google robots semantics, simplified to literal prefixes; no rules →
allowed) is computed with ``F.aggregate`` over the rules array — a codegen
expression, no Python worker anywhere in the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.urls import url_path_query


def robots_allowed(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter candidates (url=canonical, host) to robots-allowed rows.

    Equal-length allow/disallow ties resolve to ALLOW (RFC 9309 §2.2.2 /
    Google robots semantics), matching oracle.robots_allows."""
    joined = candidates.join(F.broadcast(robots), "host", "left")
    path = url_path_query(F.col("url"))
    init = F.struct(
        F.lit(-1).alias("blen"), F.lit(True).alias("allow")
    )
    best = F.aggregate(
        F.coalesce(F.col("rules"), F.array()),
        init,
        lambda acc, r: F.when(
            path.startswith(r["prefix"])
            & (
                (F.length(r["prefix"]) > acc["blen"])
                | ((F.length(r["prefix"]) == acc["blen"]) & r["allow"])
            ),
            F.struct(F.length(r["prefix"]).alias("blen"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return joined.withColumn("_allowed", best["allow"]).filter(F.col("_allowed")).drop(
        "_allowed", "rules"
    )

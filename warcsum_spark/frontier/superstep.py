"""R6 — the frontier superstep: one crawl round as a single Spark job.

    scheduled   = top-k-per-host( robots_ok( pending ∖ seen ) )
    seen'       = seen ∪ scheduled
    discovered  = canonicalize( outlinks(scheduled) ) ∖ seen' ∖ pending
    pending'    = (pending ∖ scheduled) ∪ discovered

All set operations key on the canonical URL. Everything is DataFrame ops;
the only Python is the canonicalizer UDF over newly discovered links.
The crawl loop is iterative batch (SURVEY §2.9): supersteps with
checkpointed state, not Structured Streaming.

The fetch itself is abstracted as a ``fetcher`` that maps scheduled URLs
to outlinks — in production a vectorized HTTP fetch inside mapInPandas
writing WARC/web_pages rows; in tests a broadcast-joined synthetic link
graph. The scheduler is agnostic to it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warcsum_spark.frontier.politeness import schedule_per_host
from warcsum_spark.frontier.robots import robots_allowed
from warcsum_spark.frontier.seen import build_seen_filters, filter_unseen
from warcsum_spark.functions.urls import canonicalize_url, url_host_canonical

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # canonical
        T.StructField("host", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("depth", T.IntegerType(), True),
    ]
)
SEEN_SCHEMA = T.StructType([T.StructField("url", T.StringType(), False)])


@dataclass
class FrontierState:
    pending: DataFrame  # FRONTIER_SCHEMA
    seen: DataFrame  # SEEN_SCHEMA
    round_no: int = 0


def init_frontier(spark: SparkSession, seeds: DataFrame) -> FrontierState:
    """seeds(url, priority) → round-0 state. Seed URLs are canonicalized;
    duplicates collapse keeping the max priority (set semantics)."""
    pending = (
        seeds.select(canonicalize_url(F.col("url")).alias("url"), F.col("priority"))
        .filter(F.col("url").isNotNull())
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
        .withColumn("host", url_host_canonical(F.col("url")))
        .withColumn("depth", F.lit(0))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )
    seen = spark.createDataFrame([], SEEN_SCHEMA)
    return FrontierState(pending=pending, seen=seen, round_no=0)


def frontier_round(
    spark: SparkSession,
    state: FrontierState,
    # (url, outlinks array<string>) table, OR a callable scheduled-urls →
    # that shape (e.g. sources.fetch.fetching_link_source — a real fetch)
    link_graph,
    robots: DataFrame | None = None,
    politeness: DataFrame | None = None,
    blocklist=None,  # Sequence[str] (inline literal) | DataFrame(domain)
    block_patterns: tuple[str, ...] = (),
    traps: DataFrame | None = None,  # detect_traps() output
    trap_keep: int | None = None,  # None = drop trapped hosts entirely
    default_budget: int = 2,
    depth_decay: float = 0.5,
    use_bloom: bool | str = False,  # False | True (bloom) | "cuckoo"
    bloom_partitions: int = 16,
    salt_buckets: int = 0,
    materialize: bool = True,
) -> tuple[FrontierState, DataFrame]:
    """Run one superstep; returns (new_state, scheduled).

    ``scheduled`` carries (url, host, priority, depth, host_rank) — the
    deterministic crawl order for the round is (host ASC, host_rank ASC).

    ``materialize`` truncates lineage each round (localCheckpoint): an
    iterative job whose state stays lazy re-executes EVERY prior round's
    joins on each action and the plan grows without bound. In production
    the per-round Iceberg checkpoint (frontier/checkpoint.py) provides the
    same cut; localCheckpoint is the in-memory equivalent between
    durable checkpoints.
    """
    pending = state.pending
    filters = None
    if use_bloom == "cuckoo":
        from warcsum_spark.frontier.cuckoo import (
            build_seen_cuckoo,
            filter_unseen_cuckoo,
        )

        filters = build_seen_cuckoo(state.seen, n_partitions=bloom_partitions)
        candidates = filter_unseen_cuckoo(
            pending, state.seen, filters, bloom_partitions
        )
    else:
        if use_bloom:
            filters = build_seen_filters(state.seen, n_partitions=bloom_partitions)
        candidates = filter_unseen(pending, state.seen, filters, bloom_partitions)
    if blocklist is not None or block_patterns:
        # UT1-style pre-fetch gate between "discovered" and "scheduled":
        # blocked URLs are never scheduled, but they stay pending (and
        # keep consuming nothing) rather than entering the seen set —
        # un-blocking a domain on a later round makes them schedulable
        from warcsum_spark.frontier.blocklist import blocklist_gate

        candidates = blocklist_gate(
            candidates,
            [] if blocklist is None else blocklist,
            url_patterns=block_patterns,
        )
    if traps is not None:
        # same discovered→scheduled placement as the blocklist: trapped
        # hosts' URLs are not scheduled (or only their top trap_keep are)
        # but stay pending — a host cleared of its trap flag on a later
        # round becomes schedulable again. Detection itself is the
        # caller's cadence (frontier/traps.detect_traps over pending or
        # the link stream), like robots/politeness refresh.
        from warcsum_spark.frontier.traps import trap_gate

        candidates = trap_gate(
            candidates,
            traps,
            keep_per_trap_host=trap_keep,
            salt_buckets=salt_buckets,
        )
    if robots is not None:
        candidates = robots_allowed(candidates, robots)
    scheduled = schedule_per_host(
        candidates, politeness, default_budget, salt_buckets
    )
    if materialize:
        # cut here too: everything downstream (seen', discoveries, pending')
        # reuses the scheduled set — don't recompute the gate+rank per branch
        scheduled = scheduled.localCheckpoint(eager=True)

    sched_urls = scheduled.select("url", "priority", "depth")
    new_seen = state.seen.unionByName(sched_urls.select("url")).distinct()

    # fetch: look up outlinks of scheduled urls, or run the real fetcher
    out_edges = (
        link_graph(sched_urls.select("url")) if callable(link_graph) else link_graph
    )
    discoveries = (
        sched_urls.join(out_edges, "url", "inner")
        .select(
            F.explode("outlinks").alias("raw_url"),
            (F.col("priority") * F.lit(depth_decay)).alias("priority"),
            (F.col("depth") + 1).alias("depth"),
        )
        .withColumn("url", canonicalize_url(F.col("raw_url")))
        .filter(F.col("url").isNotNull())
        .groupBy("url")
        .agg(F.max("priority").alias("priority"), F.min("depth").alias("depth"))
    )
    # ∖ seen' ∖ pending  (a URL already pending keeps its original priority)
    from warcsum_spark.frontier.seen import anti_join_urls

    discoveries = (
        anti_join_urls(anti_join_urls(discoveries, new_seen), pending.select("url"))
        .withColumn("host", url_host_canonical(F.col("url")))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )
    new_pending = (
        anti_join_urls(pending, sched_urls.select("url"))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
        .unionByName(discoveries)
    )
    if materialize:
        new_pending = new_pending.localCheckpoint(eager=True)
        new_seen = new_seen.localCheckpoint(eager=True)
    return (
        FrontierState(pending=new_pending, seen=new_seen, round_no=state.round_no + 1),
        scheduled,
    )


def scheduled_order(scheduled: DataFrame) -> list[str]:
    """The round's deterministic total crawl order (host ASC, rank ASC).

    WARNING: test/CLI helper only — collects the round's schedule to the
    driver (O(scheduled rows) driver memory). Production consumers keep
    the schedule distributed: fetch via sources/fetch.fetch_pages, persist
    via the checkpoint writer."""
    rows = scheduled.select("host", "host_rank", "url").collect()
    return [r["url"] for r in sorted(rows, key=lambda r: (r["host"], r["host_rank"]))]

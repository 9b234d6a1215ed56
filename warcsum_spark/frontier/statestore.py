"""The frontier-state persistence seam: a MERGE-INTO-shaped protocol with
a parquet-directory implementation (what the sandbox runs) and an Iceberg
implementation whose SQL is real but whose execution needs a configured
Iceberg catalog (none exists here — the seam mirrors how sources/fetch.py
isolated HTTP behind the Fetcher protocol, per warccollres.c:663–781's
precedent of swappable record acquisition).

SURVEY §1.2 maps frontier state to Iceberg ``MERGE INTO``/snapshots:

* ``seen`` is an upsert set → ``MERGE INTO ... WHEN NOT MATCHED THEN
  INSERT`` keyed on canonical url (idempotent re-commit of a round).
* ``pending`` is replaced wholesale each round → ``INSERT OVERWRITE``
  (one atomic snapshot; resume = time-travel to the round's snapshot).
* the host-hash layout maps 1:1: the parquet store's ``host_bucket``
  directory column is Iceberg's ``bucket(N, host)`` partition transform.

Both implementations satisfy ``StateStore``; the crawl loop
(``run_crawl``) only sees the protocol, so swapping persistence is a
constructor change, not a plumbing change.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession

from warcsum_spark.frontier.checkpoint import (
    latest_round,
    load_checkpoint,
    save_checkpoint,
)
from warcsum_spark.frontier.superstep import FrontierState, frontier_round


@runtime_checkable
class StateStore(Protocol):
    """Durable frontier state: commit a round, find the newest, load one."""

    def commit_round(
        self,
        state: FrontierState,
        metrics: dict | None = None,
        filters: DataFrame | None = None,
    ) -> str:
        """Persist ``state`` atomically (torn writes never loadable);
        returns an implementation-specific location string."""
        ...

    def newest_round(self) -> int | None:
        """Highest committed round number, or None if nothing committed."""
        ...

    def load(self, round_no: int | None = None) -> FrontierState:
        """Reload a committed round (default: newest). Raises
        FileNotFoundError if nothing is committed."""
        ...


class ParquetDirectoryStore:
    """The directory/commit-marker protocol of frontier/checkpoint.py
    behind the StateStore seam — what this sandbox (and any plain-HDFS/S3
    deployment without a catalog) runs."""

    def __init__(self, spark: SparkSession, root: str, host_hash_buckets: int = 0):
        self.spark = spark
        self.root = root
        self.host_hash_buckets = host_hash_buckets

    def commit_round(
        self,
        state: FrontierState,
        metrics: dict | None = None,
        filters: DataFrame | None = None,
    ) -> str:
        return save_checkpoint(
            self.root,
            state,
            metrics=metrics,
            filters=filters,
            host_hash_buckets=self.host_hash_buckets,
        )

    def newest_round(self) -> int | None:
        return latest_round(self.root, self.spark)

    def load(self, round_no: int | None = None) -> FrontierState:
        return load_checkpoint(self.spark, self.root, round_no)


# ---------------------------------------------------------------------------
# Iceberg: real SQL, catalog-gated execution
# ---------------------------------------------------------------------------


def create_seen_table_sql(table: str) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  url STRING NOT NULL
) USING iceberg
"""


def create_pending_table_sql(table: str, host_hash_buckets: int = 64) -> str:
    """``bucket(N, host)`` is the Iceberg spelling of the parquet store's
    host_bucket directory layout (save_checkpoint docstring)."""
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  url STRING NOT NULL,
  host STRING,
  priority DOUBLE,
  depth INT,
  round_no INT
) USING iceberg
PARTITIONED BY (bucket({host_hash_buckets}, host))
"""


def merge_seen_sql(table: str, source_view: str) -> str:
    """Idempotent seen-set upsert: re-committing a round re-matches its
    urls and inserts nothing twice."""
    return f"""
MERGE INTO {table} t
USING (SELECT DISTINCT url FROM {source_view}) s
ON t.url = s.url
WHEN NOT MATCHED THEN INSERT (url) VALUES (s.url)
"""


def overwrite_pending_sql(table: str, source_view: str, round_no: int) -> str:
    """Wholesale pending replacement as ONE atomic Iceberg snapshot;
    resume-from-round is snapshot time travel, not directory scans."""
    return f"""
INSERT OVERWRITE {table}
SELECT url, host, priority, depth, {round_no} AS round_no FROM {source_view}
"""


def snapshots_sql(table: str) -> str:
    """Newest-first snapshot history from the Iceberg ``.snapshots``
    metadata table — the index time-travel resume walks."""
    return f"""
SELECT snapshot_id, committed_at, operation
FROM {table}.snapshots
ORDER BY committed_at DESC
"""


def time_travel_max_round_sql(table: str, snapshot_id: int) -> str:
    """Which round a pending snapshot belongs to: INSERT OVERWRITE wrote
    exactly one round_no per snapshot, so its max IS the round."""
    return f"SELECT max(round_no) AS r FROM {table} VERSION AS OF {snapshot_id}"


def time_travel_pending_sql(table: str, snapshot_id: int, round_no: int) -> str:
    return f"""
SELECT url, host, priority, depth
FROM {table} VERSION AS OF {snapshot_id}
WHERE round_no = {round_no}
"""


def time_travel_seen_sql(table: str, snapshot_id: int) -> str:
    return f"SELECT url FROM {table} VERSION AS OF {snapshot_id}"


class IcebergStateStore:
    """StateStore over Iceberg tables ``<prefix>_pending`` /
    ``<prefix>_seen`` in a configured Spark catalog.

    The SQL this store runs is generated by the module-level builders
    (testable without a catalog); execution requires the Iceberg runtime
    jars + a ``spark.sql.catalog.<name>`` configuration, which this
    sandbox does not have — the constructor checks and raises with
    guidance instead of failing deep inside a write."""

    def __init__(self, spark: SparkSession, catalog: str, prefix: str,
                 host_hash_buckets: int = 64):
        self.spark = spark
        self.catalog = catalog
        self.prefix = prefix
        self.host_hash_buckets = host_hash_buckets
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            raise RuntimeError(
                f"no Iceberg catalog {catalog!r} configured "
                f"(spark.sql.catalog.{catalog} is unset). Add the "
                "iceberg-spark-runtime jar and catalog conf, or use "
                "ParquetDirectoryStore."
            )

    @property
    def pending_table(self) -> str:
        return f"{self.catalog}.{self.prefix}_pending"

    @property
    def seen_table(self) -> str:
        return f"{self.catalog}.{self.prefix}_seen"

    def ensure_tables(self) -> None:
        self.spark.sql(create_pending_table_sql(self.pending_table,
                                                self.host_hash_buckets))
        self.spark.sql(create_seen_table_sql(self.seen_table))

    def commit_round(
        self,
        state: FrontierState,
        metrics: dict | None = None,
        filters: DataFrame | None = None,
    ) -> str:
        # filters are rebuildable from seen (zero-false-negative rule,
        # SURVEY §7 #4) and metrics ride the snapshot summary — neither
        # needs its own table
        self.ensure_tables()
        state.seen.createOrReplaceTempView("_ss_seen_src")
        state.pending.createOrReplaceTempView("_ss_pending_src")
        self.spark.sql(merge_seen_sql(self.seen_table, "_ss_seen_src"))
        self.spark.sql(
            overwrite_pending_sql(
                self.pending_table, "_ss_pending_src", state.round_no
            )
        )
        return f"{self.pending_table}@round={state.round_no}"

    def newest_round(self) -> int | None:
        from pyspark.errors import AnalysisException

        try:
            rows = self.spark.sql(
                f"SELECT max(round_no) AS r FROM {self.pending_table}"
            ).collect()
        except AnalysisException:
            # table not created yet = nothing committed; match the
            # ParquetDirectoryStore contract instead of leaking the
            # missing-table error
            return None
        return rows[0]["r"] if rows and rows[0]["r"] is not None else None

    def load(self, round_no: int | None = None) -> FrontierState:
        from pyspark.sql import functions as F

        newest = self.newest_round()
        if newest is None:
            raise FileNotFoundError(f"no committed round in {self.pending_table}")
        if round_no is None:
            round_no = newest
        elif round_no != newest:
            # INSERT OVERWRITE keeps only the newest round's pending rows
            # in the live table; older rounds exist as Iceberg SNAPSHOTS —
            # walk the .snapshots metadata newest-first, probe each
            # overwrite's round stamp, and time-travel both tables to it.
            # Snapshot count == committed rounds, so the probe is bounded;
            # this is a resume path, not a hot loop.
            return self._load_time_travel(round_no)
        pending = (
            self.spark.read.table(self.pending_table)
            .filter(F.col("round_no") == round_no)
            .drop("round_no")
        )
        seen = self.spark.read.table(self.seen_table)
        return FrontierState(pending=pending, seen=seen, round_no=round_no)

    def _load_time_travel(self, round_no: int) -> FrontierState:
        """Historical round via VERSION AS OF. The seen snapshot paired
        with a pending snapshot is the newest seen commit at or before
        it — commit_round runs the seen MERGE before the pending
        overwrite, so that pairing is exact, not heuristic."""
        from warcsum_spark.frontier.superstep import SEEN_SCHEMA

        target = None
        for s in self.spark.sql(snapshots_sql(self.pending_table)).collect():
            got = self.spark.sql(
                time_travel_max_round_sql(self.pending_table, s["snapshot_id"])
            ).collect()[0]["r"]
            if got == round_no:
                target = s
                break
        if target is None:
            raise ValueError(
                f"round {round_no} not found in {self.pending_table} "
                "snapshot history (expired by snapshot retention?)"
            )
        pending = self.spark.sql(
            time_travel_pending_sql(
                self.pending_table, target["snapshot_id"], round_no
            )
        )
        seen_snap = None
        for s in self.spark.sql(snapshots_sql(self.seen_table)).collect():
            if s["committed_at"] <= target["committed_at"]:
                seen_snap = s
                break
        seen = (
            self.spark.sql(
                time_travel_seen_sql(self.seen_table, seen_snap["snapshot_id"])
            )
            if seen_snap is not None
            else self.spark.createDataFrame([], SEEN_SCHEMA)
        )
        return FrontierState(pending=pending, seen=seen, round_no=round_no)


def run_crawl(
    spark: SparkSession,
    store: StateStore,
    state: FrontierState,
    link_graph,
    n_rounds: int,
    checkpoint_every: int = 1,
    **round_kwargs,
) -> FrontierState:
    """Drive ``n_rounds`` supersteps, committing through the StateStore
    seam every ``checkpoint_every`` rounds — the production loop shape:
    localCheckpoint truncates lineage within the window (frontier_round),
    the store commit is the durable cut at the window boundary."""
    committed_round = None
    for _ in range(n_rounds):
        state, scheduled = frontier_round(spark, state, link_graph, **round_kwargs)
        if state.round_no % checkpoint_every == 0:
            n_sched = scheduled.count()
            store.commit_round(state, metrics={"scheduled": n_sched})
            committed_round = state.round_no
    # commit the tail: with n_rounds not a multiple of checkpoint_every
    # the final round(s) would otherwise exist only in memory, and a
    # resume from the store would silently replay them
    if committed_round != state.round_no:
        store.commit_round(state, metrics={"final": True})
    return state

"""Stages 3+4 — collision resolution + copy numbering as ONE window stage.

Reference: warccollres streams the sorted manifest one digest cluster at a
time, re-downloads member bytes, and byte-compares payloads to split a
cluster into distinct-content subgroups (process_cluster
warccollres.c:1039–1130, compare_records :354–425); warcsumproc then numbers
copies within each (digest, ext) subgroup (warcsumproc:37–53).

Spark re-expression (SURVEY §2.5 A2/A3, §2.6 W1–W3): the implicit
sort-order grouping becomes explicit keys, and the whole per-cluster state
machine collapses into three window functions over ONE exchange:

* content key ``ckey`` — exact payload bytes (default; reference semantics)
  or a (length, sha256) fingerprint for 100 TB runs where shuffling payload
  bytes is the bottleneck (probabilistically exact; digest+sha256+length
  must all collide to mis-group).
* ``ext``  = dense_rank of the subgroup's first-seen position within the
  digest cluster (W1, warccollres.c:202–205).
* ``copy_no`` = row_number within (digest, ckey) in input order (W2).
* ``refersto_uri/date`` = FIRST copy's uri/date for copies > 1, NULL for
  copy 1 (W3) — the documented warcsumproc semantics; we deliberately do
  not reproduce warccollres.c:221–231's current-record bug, nor
  warcsumproc:37's ``&&``-for-``||`` cluster-break bug (SURVEY §2.6).

Physical plan: one ``repartition(digest)`` exchange; all three windows'
ClusteredDistribution requirements are satisfied by it (their keys extend
``digest``), so they add only sorts — no second shuffle. Singleton clusters
(the common case; reference optimization X4 lazily avoided downloading
them, warccollres.c:1047–1053) cost one sort row each and never touch a
Python worker: the entire stage is JVM-side whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXTENDED_COLS = [
    "warcfile",
    "offset",
    "length",
    "uri",
    "date",
    "digest",
    "ext",
    "copy_no",
    "refersto_uri",
    "refersto_date",
]


def resolve_collisions(
    manifest: DataFrame,
    content_key: str = "payload",
    num_partitions: int | None = None,
) -> DataFrame:
    """Manifest (with ``payload`` column) → extended manifest.

    content_key='payload'      exact byte equality (oracle/reference parity)
    content_key='fingerprint'  (length, sha256) — avoids shuffling payloads
    Input order within a cluster is (warcfile, offset), matching the
    reference's file/offset visit order.
    """
    if content_key == "payload":
        ckey = F.col("payload")
    elif content_key == "fingerprint":
        ckey = F.struct(
            F.length("payload").alias("plen"), F.sha2(F.col("payload"), 256).alias("psha")
        )
    else:
        raise ValueError("content_key must be 'payload' or 'fingerprint'")

    df = manifest.withColumn("_ckey", ckey)
    if content_key == "fingerprint":
        df = df.drop("payload")  # never shuffle the bytes in fingerprint mode
    # single exchange for all three windows (their ClusteredDistribution
    # requirements extend "digest", so hash(digest) satisfies every one)
    if num_partitions:
        df = df.repartition(num_partitions, "digest")
    else:
        df = df.repartition("digest")

    ord_cols = [F.col("warcfile"), F.col("offset")]
    w_grp = Window.partitionBy("digest", "_ckey").orderBy(*ord_cols)
    # first-seen position of this row's content subgroup within the cluster
    df = df.withColumn(
        "_grp_first",
        F.min(F.struct(*ord_cols)).over(Window.partitionBy("digest", "_ckey")),
    )
    df = df.withColumn(
        "ext",
        F.dense_rank().over(Window.partitionBy("digest").orderBy("_grp_first")),
    )
    df = df.withColumn("copy_no", F.row_number().over(w_grp))
    first_uri = F.first("uri").over(w_grp)
    first_date = F.first("date").over(w_grp)
    df = df.withColumn(
        "refersto_uri", F.when(F.col("copy_no") > 1, first_uri)
    ).withColumn("refersto_date", F.when(F.col("copy_no") > 1, first_date))
    return df.select(*EXTENDED_COLS)


def extended_text(extended: DataFrame) -> DataFrame:
    """Text rendering with '-' null sentinels (warccollres.h:36–49)."""
    return extended.select(
        F.concat_ws(
            " ",
            "warcfile",
            F.col("offset").cast("string"),
            F.col("length").cast("string"),
            "uri",
            "date",
            "digest",
            F.col("ext").cast("string"),
            F.col("copy_no").cast("string"),
            F.coalesce("refersto_uri", F.lit("-")),
            F.coalesce("refersto_date", F.lit("-")),
        ).alias("line")
    )

"""R3 — URL-seen membership at 10^10-URL scale.

Two-tier design (SURVEY §2.11):

* **Exact tier**: ``left_anti`` join candidates ⋈ seen — zero false
  positives/negatives; this alone is correct but shuffles the full seen
  table every round.
* **Bloom tier** (the scale path): the seen set is hash-partitioned by
  ``pmod(xxhash64(url), n)`` and each partition is summarized into a bloom
  blob (numpy bitset, k hashes derived from xxhash64 via double hashing).
  Candidates are co-grouped with their partition's blob; "definitely not
  seen" candidates skip the exact join entirely, only "maybe seen" ones
  (true seen + fp-rate of the new) pay it. Bloom false positives are
  resolved by the exact tier, so the combined gate has **zero false
  negatives and zero false positives** — the bloom only reduces exact-join
  input volume (by ~(1-fpp) for genuinely-new URLs).

Blobs are plain binary rows ``url_seen(partition_id int, filter_blob
binary)`` — checkpointable to Iceberg/parquet and rebuildable from the seen
table at any time (rebuild-on-load beats serializing mutable state,
SURVEY §7 hard-part 4).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "partition_id int, n_keys long, n_partitions int, filter_blob binary"
)

# xxhash64-based double hashing: h_i = h1 + i*h2 mod m (Kirsch–Mitzenmacher)
_MASK = (1 << 64) - 1


def _np_hashes(h64: np.ndarray, k: int, m_bits: int) -> Iterator[np.ndarray]:
    h1 = h64.astype(np.uint64)
    h2 = (h1 >> np.uint64(33)) | (h1 << np.uint64(31))  # rotated variant
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def _optimal_params(n_keys: int, fpp: float) -> tuple[int, int]:
    n_keys = max(n_keys, 1)
    m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n_keys * math.log(2)))
    return m, min(k, 12)


def _h64_col():
    return F.xxhash64(F.col("url"))


def partition_id(n_partitions: int):
    return F.pmod(_h64_col(), F.lit(n_partitions)).cast("int")


def anti_join_urls(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """``candidates ∖ seen`` on url, joined on (xxhash64(url), url):
    identical semantics to a plain url anti-join, but the sort-merge sort
    key leads with the 8-byte hash, so string comparison only happens
    between hash-equal rows — a materially cheaper sort than ordering
    full URL strings when the join is sort-merge at scale."""
    c = candidates.withColumn("_ah", _h64_col())
    s = seen.select(_h64_col().alias("_ah"), F.col("url").alias("_au"))
    return c.join(
        s, (c["_ah"] == s["_ah"]) & (c["url"] == s["_au"]), "left_anti"
    ).drop("_ah")


def build_seen_filters(
    seen: DataFrame, n_partitions: int = 64, fpp: float = 0.01
) -> DataFrame:
    """seen(url) → url_seen(partition_id, n_keys, filter_blob)."""
    per_part_fpp = fpp

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        h = pdf["h64"].to_numpy(dtype=np.int64)
        m_bits, k = _optimal_params(len(h), per_part_fpp)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for idx in _np_hashes(h.view(np.uint64), k, m_bits):
            np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "n_keys": [len(h)],
                "n_partitions": [n_partitions],
                "filter_blob": [bits.tobytes()],
            }
        )

    return (
        seen.select(
            partition_id(n_partitions).alias("partition_id"), _h64_col().alias("h64")
        )
        .groupBy("partition_id")
        .applyInPandas(build, schema=BLOB_SCHEMA)
    )


def _blob_k(m_bits: int, n_keys: int) -> int:
    return max(1, min(12, round(m_bits / max(n_keys, 1) * math.log(2))))


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    filters: DataFrame | None = None,
    n_partitions: int = 64,
) -> DataFrame:
    """Candidates not in seen (exact). With ``filters``, bloom-short-circuit
    first so only maybe-seen rows reach the exact anti-join."""
    if filters is None:
        return anti_join_urls(candidates, seen)

    cand = candidates.withColumn("partition_id", partition_id(n_partitions)).withColumn(
        "h64", _h64_col()
    )

    def cogrouped_test(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty:  # no blob for this partition → nothing seen here
            return left.assign(maybe_seen=False)
        built_with = int(right["n_partitions"].iloc[0])
        if built_with != n_partitions:
            raise ValueError(
                f"bloom filters were built with n_partitions={built_with} "
                f"but filter_unseen was called with {n_partitions}; "
                "mismatched partitioning silently corrupts the seen gate"
            )
        bits = np.frombuffer(right["filter_blob"].iloc[0], dtype=np.uint8)
        m_bits = len(bits) * 8
        k = _blob_k(m_bits, int(right["n_keys"].iloc[0]))
        h = left["h64"].to_numpy(dtype=np.int64).view(np.uint64)
        maybe = np.ones(len(left), dtype=bool)
        for idx in _np_hashes(h, k, m_bits):
            maybe &= (bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
        return left.assign(maybe_seen=maybe)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"
    tested = (
        cand.groupBy("partition_id")
        .cogroup(filters.groupBy("partition_id"))
        .applyInPandas(lambda l, r: cogrouped_test(l, r), schema=out_schema)
    )
    definitely_new = tested.filter(~F.col("maybe_seen"))
    maybe_seen = tested.filter(F.col("maybe_seen"))
    confirmed_new = anti_join_urls(maybe_seen, seen)
    return definitely_new.unionByName(confirmed_new).drop(
        "partition_id", "h64", "maybe_seen"
    )

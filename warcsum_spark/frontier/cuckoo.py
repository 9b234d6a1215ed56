"""Per-partition cuckoo filters for the URL-seen set — the deletable
alternative to the bloom tier (north_star: "bloom/cuckoo-filter URL-seen
set"; design per Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14, and PAPERS.md's learned-cuckoo line of work).

Same contract as frontier/seen.py's bloom tier: blobs are plain binary
rows ``(partition_id, n_keys, filter_blob)`` built per hash-partition of
the seen table and co-grouped against candidates; "definitely not seen"
candidates skip the exact anti-join, and the exact tier resolves the
false positives, so the combined gate stays exactly correct. Unlike
bloom, a cuckoo filter supports deletion — relevant when a crawl retracts
URLs (robots change, host blacklisting) without rebuilding the filter.

Layout: buckets of 4 single-byte fingerprints (fp 1..255; 0 = empty).
Insert uses the standard two-bucket partial-key cuckoo scheme:
    i1 = h(x) mod m,  i2 = i1 XOR h(fp) mod m
with vectorized numpy bulk inserts and a bounded eviction loop.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.frontier.seen import partition_id

BUCKET_SIZE = 4
MAX_KICKS = 250

CUCKOO_SCHEMA = "partition_id int, n_keys long, filter_blob binary"


def _fp(h64: np.ndarray) -> np.ndarray:
    """1-byte fingerprint in 1..255 (0 means empty slot)."""
    f = ((h64 >> np.uint64(40)) & np.uint64(0xFF)).astype(np.uint8)
    return np.where(f == 0, np.uint8(1), f)


def _alt_index(idx: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    # h(fp) via a splittable 32-bit mix of the fingerprint byte
    fp_hash = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFF)
    return (idx ^ fp_hash.astype(np.int64)) % m


def _n_buckets(n_keys: int, load: float = 0.84) -> int:
    m = max(8, int(math.ceil(n_keys / (BUCKET_SIZE * load))))
    return 1 << max(3, (m - 1).bit_length())  # power of two


class CuckooTable:
    """numpy-backed cuckoo table; (de)serializes to a flat byte blob."""

    def __init__(self, n_keys: int):
        self.m = _n_buckets(max(n_keys, 1))
        self.slots = np.zeros((self.m, BUCKET_SIZE), dtype=np.uint8)

    def insert_many(self, h64: np.ndarray) -> int:
        fps = _fp(h64)
        idxs = (h64 % np.uint64(self.m)).astype(np.int64)
        overflow = 0
        for fp, i1 in zip(fps, idxs):
            if not self._insert(int(fp), int(i1)):
                overflow += 1
        return overflow

    def _insert(self, fp: int, i1: int) -> bool:
        i2 = int(_alt_index(np.array([i1]), np.array([fp], dtype=np.uint8), self.m)[0])
        for i in (i1, i2):
            row = self.slots[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict
        i = i1
        cur = fp
        rng = np.random.RandomState((fp * 2654435761 + i1) & 0x7FFFFFFF)
        for _ in range(MAX_KICKS):
            slot = int(rng.randint(BUCKET_SIZE))
            cur, self.slots[i, slot] = int(self.slots[i, slot]), cur
            i = int(
                _alt_index(np.array([i]), np.array([cur], dtype=np.uint8), self.m)[0]
            )
            row = self.slots[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table over capacity; caller records overflow

    def contains_many(self, h64: np.ndarray) -> np.ndarray:
        fps = _fp(h64)
        i1 = (h64 % np.uint64(self.m)).astype(np.int64)
        i2 = _alt_index(i1, fps, self.m)
        found = np.zeros(len(h64), dtype=bool)
        for k in range(BUCKET_SIZE):
            found |= self.slots[i1, k] == fps
            found |= self.slots[i2, k] == fps
        return found

    def delete_many(self, h64: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns #deleted."""
        fps = _fp(h64)
        i1 = (h64 % np.uint64(self.m)).astype(np.int64)
        i2 = _alt_index(i1, fps, self.m)
        n = 0
        for fp, a, b in zip(fps, i1, i2):
            for i in (int(a), int(b)):
                hit = np.nonzero(self.slots[i] == fp)[0]
                if len(hit):
                    self.slots[i, hit[0]] = 0
                    n += 1
                    break
        return n

    def to_blob(self) -> bytes:
        return self.slots.tobytes()

    @classmethod
    def from_blob(cls, blob: bytes) -> "CuckooTable":
        t = cls.__new__(cls)
        arr = np.frombuffer(blob, dtype=np.uint8)
        t.m = len(arr) // BUCKET_SIZE
        t.slots = arr.reshape(t.m, BUCKET_SIZE).copy()
        return t


def _h64_col():
    return F.xxhash64(F.col("url"))


def build_seen_cuckoo(seen: DataFrame, n_partitions: int = 64) -> DataFrame:
    """seen(url) → url_seen(partition_id, n_keys, filter_blob), cuckoo."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        h = pdf["h64"].to_numpy(dtype=np.int64).view(np.uint64)
        t = CuckooTable(len(h))
        t.insert_many(h)
        return pd.DataFrame(
            {"partition_id": [pid], "n_keys": [len(h)], "filter_blob": [t.to_blob()]}
        )

    return (
        seen.select(partition_id(n_partitions).alias("partition_id"), _h64_col().alias("h64"))
        .groupBy("partition_id")
        .applyInPandas(build, schema=CUCKOO_SCHEMA)
    )


def filter_unseen_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    filters: DataFrame,
    n_partitions: int = 64,
) -> DataFrame:
    """Two-tier gate with cuckoo blobs: same exact-correctness contract as
    seen.filter_unseen (cuckoo false positives resolved by the exact
    anti-join; zero false negatives by construction)."""
    cand = candidates.withColumn("partition_id", partition_id(n_partitions)).withColumn(
        "h64", _h64_col()
    )

    def test(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty:
            return left.assign(maybe_seen=False)
        t = CuckooTable.from_blob(right["filter_blob"].iloc[0])
        h = left["h64"].to_numpy(dtype=np.int64).view(np.uint64)
        return left.assign(maybe_seen=t.contains_many(h))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"
    tested = (
        cand.groupBy("partition_id")
        .cogroup(filters.groupBy("partition_id"))
        .applyInPandas(test, schema=out_schema)
    )
    definitely_new = tested.filter(~F.col("maybe_seen"))
    confirmed_new = tested.filter(F.col("maybe_seen")).join(seen, "url", "left_anti")
    return definitely_new.unionByName(confirmed_new).drop(
        "partition_id", "h64", "maybe_seen"
    )

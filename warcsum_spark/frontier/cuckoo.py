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

CUCKOO_SCHEMA = (
    "partition_id int, n_keys long, n_partitions int, filter_blob binary"
)


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
    """numpy-backed cuckoo table; (de)serializes to a flat byte blob.

    Zero false negatives even past capacity: a key dropped after MAX_KICKS
    evictions is kept verbatim in a side exact list (``overflow``) that is
    serialized with the blob and checked by ``contains_many`` — without it,
    an overflowed seen URL would test "definitely not seen" and be
    re-crawled, breaking the crawl-equivalence contract. Overflow is empty
    at the design load (0.84); the list only grows when a partition is
    driven past capacity."""

    def __init__(self, n_keys: int, load: float = 0.84):
        self.m = _n_buckets(max(n_keys, 1), load)
        self.slots = np.zeros((self.m, BUCKET_SIZE), dtype=np.uint8)
        self.overflow = np.empty(0, dtype=np.uint64)

    def insert_many(self, h64: np.ndarray) -> int:
        fps = _fp(h64)
        idxs = (h64 % np.uint64(self.m)).astype(np.int64)
        dropped = []
        for key, fp, i1 in zip(h64, fps, idxs):
            if not self._insert(int(fp), int(i1)):
                dropped.append(key)
        if dropped:
            self.overflow = np.concatenate(
                [self.overflow, np.array(dropped, dtype=np.uint64)]
            )
        return len(dropped)

    def _insert(self, fp: int, i1: int) -> bool:
        i2 = int(_alt_index(np.array([i1]), np.array([fp], dtype=np.uint8), self.m)[0])
        for i in (i1, i2):
            row = self.slots[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict, remembering the swap chain: on failure the homeless
        # fingerprint is the LAST victim, not the new key — rolling the
        # chain back leaves the table exactly as before, so the caller can
        # safely record the NEW key in the overflow exact list (recording
        # it without rollback would silently lose the victim key: a false
        # negative).
        i = i1
        cur = fp
        rng = np.random.RandomState((fp * 2654435761 + i1) & 0x7FFFFFFF)
        path: list[tuple[int, int, int]] = []
        for _ in range(MAX_KICKS):
            slot = int(rng.randint(BUCKET_SIZE))
            victim = int(self.slots[i, slot])
            self.slots[i, slot] = cur
            path.append((i, slot, victim))
            cur = victim
            i = int(
                _alt_index(np.array([i]), np.array([cur], dtype=np.uint8), self.m)[0]
            )
            row = self.slots[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        for bi, slot, victim in reversed(path):
            self.slots[bi, slot] = victim
        return False  # table over capacity; caller records overflow

    def contains_many(self, h64: np.ndarray) -> np.ndarray:
        fps = _fp(h64)
        i1 = (h64 % np.uint64(self.m)).astype(np.int64)
        i2 = _alt_index(i1, fps, self.m)
        found = np.zeros(len(h64), dtype=bool)
        for k in range(BUCKET_SIZE):
            found |= self.slots[i1, k] == fps
            found |= self.slots[i2, k] == fps
        if len(self.overflow):
            found |= np.isin(h64, self.overflow)
        return found

    def delete_many(self, h64: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns #deleted."""
        fps = _fp(h64)
        i1 = (h64 % np.uint64(self.m)).astype(np.int64)
        i2 = _alt_index(i1, fps, self.m)
        n = 0
        for key, fp, a, b in zip(h64, fps, i1, i2):
            hit_ov = np.nonzero(self.overflow == key)[0]
            if len(hit_ov):
                self.overflow = np.delete(self.overflow, hit_ov[0])
                n += 1
                continue
            for i in (int(a), int(b)):
                hit = np.nonzero(self.slots[i] == fp)[0]
                if len(hit):
                    self.slots[i, hit[0]] = 0
                    n += 1
                    break
        return n

    def to_blob(self) -> bytes:
        # layout: n_overflow (uint64 LE) | overflow keys (uint64 LE each) | slots
        header = np.array([len(self.overflow)], dtype="<u8").tobytes()
        return header + self.overflow.astype("<u8").tobytes() + self.slots.tobytes()

    @classmethod
    def from_blob(cls, blob: bytes) -> "CuckooTable":
        t = cls.__new__(cls)
        n_ov = int(np.frombuffer(blob[:8], dtype="<u8")[0])
        body = 8 + 8 * n_ov
        t.overflow = np.frombuffer(blob[8:body], dtype="<u8").astype(np.uint64)
        arr = np.frombuffer(blob[body:], dtype=np.uint8)
        t.m = len(arr) // BUCKET_SIZE
        t.slots = arr.reshape(t.m, BUCKET_SIZE).copy()
        return t


def _h64_col():
    return F.xxhash64(F.col("url"))


def build_seen_cuckoo(
    seen: DataFrame, n_partitions: int = 64, load: float = 0.84
) -> DataFrame:
    """seen(url) → url_seen(partition_id, n_keys, n_partitions, filter_blob).

    ``n_partitions`` is persisted with each blob so the read side can verify
    it was built with the same partitioning function (a mismatch would
    silently route candidates to the wrong blob). ``load`` is exposed for
    tests that force overflow; production uses the 0.84 design load."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        h = pdf["h64"].to_numpy(dtype=np.int64).view(np.uint64)
        t = CuckooTable(len(h), load=load)
        t.insert_many(h)  # overflow keys land in the blob's side exact list
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "n_keys": [len(h)],
                "n_partitions": [n_partitions],
                "filter_blob": [t.to_blob()],
            }
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
        built_with = int(right["n_partitions"].iloc[0])
        if built_with != n_partitions:
            raise ValueError(
                f"cuckoo filters were built with n_partitions={built_with} "
                f"but filter_unseen_cuckoo was called with {n_partitions}; "
                "mismatched partitioning silently corrupts the seen gate"
            )
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
    from warcsum_spark.frontier.seen import anti_join_urls

    definitely_new = tested.filter(~F.col("maybe_seen"))
    confirmed_new = anti_join_urls(tested.filter(F.col("maybe_seen")), seen)
    return definitely_new.unionByName(confirmed_new).drop(
        "partition_id", "h64", "maybe_seen"
    )

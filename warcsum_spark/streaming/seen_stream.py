"""Streaming URL-seen gate — the engine's one custom *stateful* streaming
operator (§2.9 extension; the batch crawl keeps its seen set in the
superstep/Iceberg loop, but a continuous-discovery feed needs first-seen
semantics ACROSS micro-batches).

``applyInPandasWithState`` over hash buckets: discovered URLs are grouped
by ``pmod(xxhash64(url), n_buckets)``; each group's state is the packed
uint64 array of url-hashes seen so far (binary-compact: 8 B/url, the same
keying the batch tiers use — murmur3/xxhash64 per north_star). A URL is
emitted exactly the first time its hash appears; collisions are the usual
64-bit-birthday risk (~n²/2⁶⁴ — for 10¹⁰ urls use the batch exact tier,
this operator is for bounded per-stream dedup).

State sizing at scale: n_buckets bounds per-group state (10⁸ urls /
1024 buckets ≈ 0.8 MB/group); buckets are the shuffle key so state is
evenly spread across executors by construction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("packed", T.BinaryType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _first_seen_gate(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        packed, n_seen = state.get
        seen = set(np.frombuffer(packed, dtype=np.uint64).tolist())
    else:
        seen = set()
    out_urls: list[str] = []
    for pdf in pdfs:
        hs = pdf["h64"].to_numpy(dtype=np.int64).view(np.uint64)
        for u, h in zip(pdf["url"], hs.tolist()):
            if h not in seen:
                seen.add(h)
                out_urls.append(u)
    state.update(
        (np.fromiter(seen, dtype=np.uint64, count=len(seen)).tobytes(), len(seen))
    )
    yield pd.DataFrame({"url": out_urls, "bucket": [key[0]] * len(out_urls)})


def stream_first_seen(urls: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Streaming (url) → first-seen (url, bucket), stateful across
    micro-batches. ``urls`` must be a streaming DataFrame with a ``url``
    column (already canonicalized)."""
    keyed = urls.select(
        "url",
        F.xxhash64("url").alias("h64"),
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _first_seen_gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

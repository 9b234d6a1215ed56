"""T116 — content-defined chunking (Gear rolling hash with FastCDC's
normalized two-mask cut rule; Xia et al., USENIX ATC 2016) and the
chunk-level storage-dedup accounting built on it.

Fixed-size blocks lose all alignment after one byte inserted upstream;
content-defined boundaries re-synchronize within a window, which is why
every dedup store (LBFS, Venti, restic/borg, commercial backup) cuts on
content. For a crawl archive the payoff is byte-level cross-page
dedup: boilerplate headers/footers and templated fragments repeat
across a host's pages even when whole-document digests (F1) and
near-dup text dedup (T1) both miss them.

Hash definition — *windowed* Gear: H(p) = Σ_{m=0..63} gear[b[p−1−m]]≪m
(mod 2^64), i.e. the classic per-chunk recurrence H ← (H≪1)+gear[b]
run over the WHOLE document without restarting at chunk starts (bytes
older than 64 positions shift out either way, so only the first 64
bytes after a cut differ from the paper's restart form). Boundaries
are then purely content-local — the property CDC wants — and the
kernel vectorizes: the engine computes H for a whole Arrow batch as 64
shifted adds over the flattened byte buffer (pad codes between docs
contribute zero, so windows never leak across documents), then walks
only the precomputed mask-hit positions per doc. The oracle twin
(oracle_refs.ref_cdc_doc) runs the plain-int recurrence byte by byte —
same function, opposite code shape.

Cut rule at chunk length L (FastCDC normalized chunking): positions
L < min_size are skipped outright; L in [min_size, normal_size) cuts
on the HARD mask (normal_bits+2 low bits zero), L in [normal_size,
max_size) on the EASY mask (normal_bits−2 bits); L = max_size forces a
cut. Chunk identity is md5 of the chunk bytes (the digest family the
reference pipeline already standardizes on, warcsum.c:881–1011).

At 100 TB: chunking is embarrassingly parallel (one Arrow kernel pass,
zero shuffles); the accounting groupBy carries (16-byte hash, length)
rows — bytes never shuffle. Reference anchor: warcsum's whole-payload
digest manifest (F1/O1) is the record-grain ancestor of this
sub-record grain; §2.12 storage tier.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warcsum_spark.operators.dedup import _splitmix

_WINDOW = 64

# deterministic public gear table: splitmix64 of the byte value + 1;
# index 256 is the zero-contribution inter-document pad code
_GEAR = np.concatenate(
    [
        _splitmix(np.arange(1, 257, dtype=np.uint64)),
        np.zeros(1, dtype=np.uint64),
    ]
)
_PAD_CODE = 256


def _masks(normal_size: int) -> tuple[int, int]:
    bits = int(round(np.log2(normal_size)))
    return (1 << (bits + 2)) - 1, (1 << max(bits - 2, 1)) - 1


def _cut_points(
    s_hits: np.ndarray,
    l_hits: np.ndarray,
    n: int,
    min_size: int,
    normal_size: int,
    max_size: int,
) -> list[int]:
    """Walk the precomputed mask-hit position lists (ascending) for one
    document and return the cut positions (exclusive chunk ends)."""
    cuts = []
    start = 0
    while start < n:
        end = min(start + max_size, n)
        cut = end
        # hard mask over [start+min, start+normal)
        lo = np.searchsorted(s_hits, start + min_size, side="left")
        if lo < len(s_hits) and s_hits[lo] < min(start + normal_size, end):
            cut = int(s_hits[lo])
        else:
            # easy mask over [start+normal, start+max)
            lo = np.searchsorted(l_hits, start + normal_size, side="left")
            if lo < len(l_hits) and l_hits[lo] < end:
                cut = int(l_hits[lo])
        cuts.append(cut)
        start = cut
    return cuts


def _cdc_chunks_udf(min_size: int, normal_size: int, max_size: int):
    if not 0 < min_size <= normal_size <= max_size:
        raise ValueError(
            f"need 0 < min <= normal <= max, got "
            f"({min_size}, {normal_size}, {max_size})"
        )
    mask_s, mask_l = _masks(normal_size)
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("offset", T.LongType()),
                T.StructField("length", T.LongType()),
                T.StructField("chunk_hash", T.StringType()),
            ]
        )
    )

    @F.arrow_udf(out_type)
    def cdc_chunks(texts: pa.Array) -> pa.Array:
        with np.errstate(over="ignore"):
            return _kernel(texts)

    def _kernel(texts):
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_rows = len(texts)
        null_rows = np.asarray(texts.is_null())
        if n_rows == 0:
            return pa.array([], type=pa.list_(
                pa.struct(
                    [("offset", pa.int64()), ("length", pa.int64()),
                     ("chunk_hash", pa.string())]
                )
            ))
        dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        offs = np.frombuffer(texts.buffers()[1], dtype=dt)[
            texts.offset : texts.offset + n_rows + 1
        ].astype(np.int64)
        data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
        base = offs[0]
        starts = offs[:-1] - base
        lens = np.diff(offs)
        total = int(offs[-1] - base)
        raw = data[base : offs[-1]]

        # padded code stream: WINDOW-1 pad codes between docs so the
        # 64-term window sum never crosses a document boundary
        pad = _WINDOW - 1
        stream_len = total + pad * n_rows
        codes = np.full(stream_len, _PAD_CODE, dtype=np.int64)
        stream_starts = starts + pad * (np.arange(n_rows) + 1)
        put = np.arange(total, dtype=np.int64) + np.repeat(
            stream_starts - starts, lens
        )
        codes[put] = raw
        g = _GEAR[codes]
        # H[p] = sum_m g[p-1-m] << m  — 64 shifted adds, whole batch
        h = np.zeros(stream_len + 1, dtype=np.uint64)
        for m in range(_WINDOW):
            h[m + 1 :] += g[: stream_len - m] << np.uint64(m)
        s_hit_pos = np.nonzero((h & np.uint64(mask_s)) == 0)[0]
        l_hit_pos = np.nonzero((h & np.uint64(mask_l)) == 0)[0]

        out = []
        for i in range(n_rows):
            if null_rows[i]:
                out.append(None)
                continue
            n = int(lens[i])
            if n == 0:
                out.append([])
                continue
            s0 = int(stream_starts[i])
            sh = s_hit_pos[
                np.searchsorted(s_hit_pos, s0) : np.searchsorted(
                    s_hit_pos, s0 + n + 1
                )
            ] - s0
            lh = l_hit_pos[
                np.searchsorted(l_hit_pos, s0) : np.searchsorted(
                    l_hit_pos, s0 + n + 1
                )
            ] - s0
            cuts = _cut_points(sh, lh, n, min_size, normal_size, max_size)
            doc = raw[int(starts[i]) : int(starts[i]) + n]
            chunks, prev = [], 0
            for c in cuts:
                chunks.append(
                    {
                        "offset": prev,
                        "length": c - prev,
                        "chunk_hash": hashlib.md5(
                            doc[prev:c].tobytes()
                        ).hexdigest(),
                    }
                )
                prev = c
            out.append(chunks)
        return pa.array(
            out,
            type=pa.list_(
                pa.struct(
                    [("offset", pa.int64()), ("length", pa.int64()),
                     ("chunk_hash", pa.string())]
                )
            ),
        )

    return cdc_chunks


def cdc_chunk_docs(
    docs: DataFrame,
    min_size: int = 32,
    normal_size: int = 128,
    max_size: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, offset, length, chunk_hash) — one row per
    content-defined chunk of the document's UTF-8 bytes. Zero shuffles:
    parquet scan → one Arrow kernel → posexplode."""
    from warcsum_spark.session import ensure_min_parallelism

    udf = _cdc_chunks_udf(min_size, normal_size, max_size)
    docs = ensure_min_parallelism(docs)
    # posexplode_OUTER + a post-explode filter, NOT a plain posexplode:
    # the non-outer Generate infers a (size(_ch) > 0 AND _ch IS NOT
    # NULL) predicate and Catalyst pushes it below the
    # ensure_min_parallelism exchange, DUPLICATING the Arrow kernel
    # (two ArrowEvalPython nodes, the first on the unparallelized scan
    # partitions — every row was chunked twice). The outer Generate
    # infers nothing; null/empty arrays yield one null-pos row that the
    # chunk_id filter drops, which is exactly the non-outer row set.
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("_ch")
        )
        .select(
            "doc_id", F.posexplode_outer("_ch").alias("chunk_id", "_c")
        )
        .filter(F.col("chunk_id").isNotNull())
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("_c.offset").alias("offset"),
            F.col("_c.length").alias("length"),
            F.col("_c.chunk_hash").alias("chunk_hash"),
        )
    )


def cdc_dedup_accounting(
    docs: DataFrame,
    min_size: int = 32,
    normal_size: int = 128,
    max_size: int = 512,
    min_copies: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk-level storage-dedup ledger: for every chunk content seen
    ``min_copies``+ times, (chunk_hash, chunk_len, n_copies,
    saved_bytes) with saved = (n_copies − 1) × length — the bytes a
    content-addressed store would not write twice. The groupBy is the
    only exchange and carries (hash, long) rows, never chunk bytes."""
    chunks = cdc_chunk_docs(
        docs, min_size, normal_size, max_size, id_col, text_col
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.max("length").alias("chunk_len"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= min_copies)
        .select(
            "chunk_hash",
            "chunk_len",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("chunk_len")).alias(
                "saved_bytes"
            ),
        )
    )

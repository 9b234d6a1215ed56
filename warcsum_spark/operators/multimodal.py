"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata struct, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The actual codecs (Pillow, ffmpeg, torchaudio) are NOT in this container,
so the decode kernels are stubbed two ways (as mandated by the build
brief): a clearly-marked ``NotImplementedError`` when a real codec is
requested, and a deterministic fake decoder used by tests. The Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real: swapping in a real codec changes only the numpy kernel inside the
batch loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, n_bytes long"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"

FRAME_SCHEMA = "media_id long, frame_no int, ts_ms int, frame binary"

_REAL_CODECS = False  # no image/audio libs in this container


def _fake_decode(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder+embedder. Feature bytes come
    from a sha256 hex chain — block 0 = sha256(blob), block n =
    sha256(hex(block n-1)) — so an external SQL engine can recompute them
    (DuckDB: ``sha256(text)`` on the same payload; the driver's
    multimodal_features oracle does exactly that). feature[i] =
    (byte_i − 127.5) / 127.5 as float32, i.e. [-1, 1). Stable across
    runs/partitions — safe for tests and cross-engine checks."""
    h = hashlib.sha256(blob).hexdigest()
    chain = h
    while len(chain) // 2 < dim:
        h = hashlib.sha256(h.encode("ascii")).hexdigest()
        chain += h
    b = np.frombuffer(bytes.fromhex(chain[: 2 * dim]), dtype=np.uint8)
    return ((b.astype(np.float32) - np.float32(127.5)) / np.float32(127.5)).astype(
        np.float32
    )


def attach_media_meta(media: DataFrame) -> DataFrame:
    """(media_id, kind, mime, blob) → + typed metadata. Sizes come from the
    blob itself (JVM ``length``); width/height/duration need the codec and
    are null in stub mode."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.length("blob").cast("long").alias("n_bytes"),
    )


def extract_features(
    media: DataFrame, dim: int = 64, use_real_codec: bool = False
) -> DataFrame:
    """(media_id, kind, blob) → (media_id, kind, feature, feat_dim).

    Arrow-batched; one numpy kernel call per batch. With
    ``use_real_codec`` this raises until codecs are installed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codec and not _REAL_CODECS:
                raise NotImplementedError(
                    "real image/audio decode requires Pillow/ffmpeg — "
                    "not available in this environment; use the deterministic "
                    "stub (use_real_codec=False)"
                )
            feats = [
                _fake_decode(bytes(b) if b is not None else b"", dim).tolist()
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return media.select("media_id", "kind", "blob").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_real_codec: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: (media_id, blob, duration_ms) →
    (media_id, frame_no, ts_ms, frame). Stub mode emits deterministic
    pseudo-frames (sha256 of blob+frame_no) at the real cadence."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codec and not _REAL_CODECS:
                raise NotImplementedError("frame decode requires ffmpeg")
            out: dict[str, list] = {"media_id": [], "frame_no": [], "ts_ms": [], "frame": []}
            for mid, blob, dur in zip(pdf["media_id"], pdf["blob"], pdf["duration_ms"]):
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(
                        hashlib.sha256(bytes(blob or b"") + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "blob", "duration_ms").mapInPandas(
        run, schema=FRAME_SCHEMA
    )

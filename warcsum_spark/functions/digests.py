"""Digest column functions — reference parity: warcsum.c hash_init/update/final
(warcsum.c:8–168) and base32→hex conversion (warcsum.c:195–250).

The reference streams payload chunks through OpenSSL incrementally because it
never holds a member in memory; with the payload as a table column the digest
is a single built-in JVM expression — `F.md5` / `F.sha1` / `F.sha2` over
BinaryType produce the same lowercase hex. Built-ins run inside whole-stage
codegen; only base32 decoding (no Spark built-in) drops to an Arrow UDF.
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_ALGOS = ("md5", "sha1", "sha256", "sha512")


def digest_hex(payload: Column, algo: str) -> Column:
    """Lowercase-hex digest of a binary column via JVM built-ins (F1)."""
    if algo == "md5":
        return F.md5(payload)
    if algo == "sha1":
        return F.sha1(payload)
    if algo == "sha256":
        return F.sha2(payload, 256)
    if algo == "sha512":
        return F.sha2(payload, 512)
    raise ValueError(f"unsupported algo {algo!r}; expected one of {SUPPORTED_ALGOS}")


@F.pandas_udf(T.StringType())
def base32_to_hex(b32: pd.Series) -> pd.Series:
    """RFC 4648 base32 → lowercase hex (F3; warcsum.c:195–250).

    WARC-Payload-Digest stores sha1 as unpadded base32. Invalid input → null
    (the reference rejects and recomputes — warcsum.c:226 asserts; we map
    the reject to null so the caller's coalesce falls back to recompute).
    """

    def conv(s):
        if s is None:
            return None
        try:
            t = s.strip().upper()
            return base64.b32decode(t + "=" * ((-len(t)) % 8)).hex()
        except Exception:
            return None

    return b32.map(conv)


def select_digest(
    payload: Column,
    algo: str,
    stored_algo: Column,
    stored_b32: Column,
    force: bool = True,
) -> Column:
    """F4 stored-digest reuse: with ``force`` (the default engine profile —
    BASELINE.json's digest equivalence requires recomputation) always
    recompute; otherwise reuse the stored digest when its algorithm matches,
    falling back to recompute when absent/invalid. Implements the
    *documented* semantics (warcsum.1:52–55), not the inverted-flag bug at
    warcsum.c:414–417."""
    computed = digest_hex(payload, algo)
    if force:
        return computed
    stored_ok = (F.lower(stored_algo) == algo) & stored_b32.isNotNull()
    return F.coalesce(
        F.when(stored_ok, base32_to_hex(stored_b32)), computed
    )

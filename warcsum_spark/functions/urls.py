"""URL column functions for the frontier (R1/R2, BASELINE.json north_star:
"murmur3 over RFC-3986-normalized URLs").

Canonicalization is pure-Python string work with no Spark built-in, so it
runs as an Arrow-batched pandas UDF (never per-row Python through serde).
Hashing stays JVM-side: ``F.hash`` *is* murmur3_x86_32 (seed 42) and
``F.xxhash64`` the 64-bit variant — no UDF needed.

This is an independent implementation of the same spec as
``oracle.canonicalize_url`` (the tests cross-check them):
lowercase scheme/host, strip trailing host dot + default port, resolve
dot-segments, percent-decode unreserved chars / uppercase other escapes,
drop fragment, empty path → "/". Non-http(s) or unparseable → null.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLIT = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_DEFAULT_PORT = {"http": "80", "https": "443"}
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT = re.compile(r"%([0-9A-Fa-f]{2})|%")
_IPV6_AUTH = re.compile(r"^\[(?P<v6>[0-9A-Fa-f:.]+)\](?::(?P<port>\d*))?$")


def _pct_norm(s: str) -> str:
    def repl(m: re.Match) -> str:
        hx = m.group(1)
        if hx is None:
            return "%"  # stray '%' kept verbatim (oracle does the same)
        ch = chr(int(hx, 16))
        return ch if ch in _UNRESERVED else "%" + hx.upper()

    return _PCT.sub(repl, s)


def _dot_segments(path: str) -> str:
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs and segs[-1] != "":
                segs.pop()
                if not segs:
                    segs = [""]
        else:
            segs.append(seg)
    out = "/".join(segs)
    return out if out.startswith("/") else "/" + out


def canonicalize_one(url) -> str | None:
    if url is None:
        return None
    m = _SPLIT.match(str(url).strip())
    if m is None:
        return None
    scheme = m["scheme"].lower()
    if scheme not in _DEFAULT_PORT:
        return None
    auth = m["auth"]
    if "@" in auth:  # userinfo not supported by the oracle spec either
        auth = auth.rsplit("@", 1)[1]
    if auth.startswith("["):  # IPv6 literal: keep brackets, lowercase hex
        m6 = _IPV6_AUTH.match(auth)
        if m6 is None:
            return None
        host = f"[{m6['v6'].lower()}]"
        port = m6["port"]
    else:
        host, _sep, port = auth.partition(":")
        host = host.lower().rstrip(".")
    if not host or host == "[]":
        return None
    if port is not None and port != "":
        if not port.isdigit():
            return None
        # compare numerically: ':080' IS the default port (oracle twin
        # uses urlsplit().port, an int)
        if int(port) != int(_DEFAULT_PORT[scheme]):
            host = f"{host}:{int(port)}"
    path = _pct_norm(_dot_segments(m["path"] or "/"))
    query = m["query"]
    out = f"{scheme}://{host}{path}"
    if query is not None and query != "":
        out += "?" + _pct_norm(query)
    return out


def _host_of(url) -> str | None:
    if url is None:
        return None
    m = _SPLIT.match(str(url))
    if m is None:
        return None
    auth = m["auth"]
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    if auth.startswith("["):  # IPv6: unbracketed, like urlsplit().hostname
        m6 = _IPV6_AUTH.match(auth)
        return m6["v6"].lower() if m6 else None
    return auth.partition(":")[0].lower().rstrip(".") or None


# A URL this regex accepts is ALREADY in canonical form: lowercase
# http(s), strict lowercase hostname (no trailing dot, no userinfo, no
# port — default ports are the only ones most crawls see, and non-default
# ports fall through to the slow path), a path that starts with '/', and no
# '%' escapes, '#' fragment, empty query, or '.'/'..' segments anywhere.
# For every accepted URL, canonicalize(url) == url (property-tested).
_CANONICAL_RE = (
    r"^https?://"
    r"[a-z0-9](?:[a-z0-9\-]*[a-z0-9])?(?:\.[a-z0-9](?:[a-z0-9\-]*[a-z0-9])?)*"
    r"/[^%#?\s]*(?:\?[^%#\s]+)?$"
)
_CANONICAL_C = re.compile(_CANONICAL_RE)
_DOTSEG_C = re.compile(r"/\.\.?(/|$)")


@F.pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Two-tier INSIDE the UDF: a vectorized (C-loop) regex accepts
    already-canonical URLs verbatim — the common case in a well-behaved
    crawl — and only the messy tail goes through the per-row
    ``canonicalize_one``. The tiering must live inside the UDF, not in a
    JVM ``F.when``: Catalyst's ExtractPythonUDFs hoists a Python UDF out of
    CASE WHEN and evaluates it for EVERY row, so a JVM-side fast path
    never actually skips Python work (verified on the physical plan)."""
    fast = urls.str.match(_CANONICAL_C, na=False) & ~urls.str.contains(
        _DOTSEG_C, na=False
    )
    out = urls.where(fast, None)
    slow = ~fast
    if slow.any():
        out[slow] = urls[slow].map(canonicalize_one)
    return out


@F.pandas_udf(T.StringType())
def url_host(urls: pd.Series) -> pd.Series:
    """Vectorized host extraction for plain authorities (no userinfo /
    IPv6 bracket), per-row fallback for the rest."""
    ext = urls.str.extract(
        r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#@\[]+)(?=[/:?#]|$)", expand=False
    )
    out = ext.str.lower().str.rstrip(".")
    out = out.where(out != "", None)
    slow = out.isna()
    if slow.any():
        out[slow] = urls[slow].map(_host_of)
    return out


def canonicalize_url_fast(url: Column) -> Column:
    """Kept as the public name used by the superstep/bench; the fast path
    now lives inside ``canonicalize_url`` itself (see its docstring — a
    JVM-side CASE cannot skip an ArrowEvalPython)."""
    return canonicalize_url(url)


def url_hash(canon_url: Column) -> Column:
    """murmur3_x86_32(seed 42) of the canonical URL — JVM built-in (R2)."""
    return F.hash(canon_url)


def url_hash64(canon_url: Column) -> Column:
    return F.xxhash64(canon_url)


def url_path_query(canon_url: Column) -> Column:
    """path[?query] part of an already-canonical URL, for robots matching —
    pure JVM expression (regexp), no UDF."""
    return F.regexp_replace(canon_url, r"^[a-z]+://[^/]*", "")

"""S7 — the fetch stage as a pluggable, vectorized mapInPandas operator.

The reference re-downloads each record's bytes with an HTTP range GET and
walks the record's mirror list on failure (warccollres.c:663–781; mirror
loop :718–740). Spark re-expression: ``fetch_pages`` runs a *fetcher* once
per partition inside ``mapInPandas`` — one connection pool per partition,
rows streamed through it in Arrow batches, results emitted as ordinary
columns. The crawl loop (frontier/superstep.py) and the collres payload
re-attach both consume it through the same interface, so swapping the
synthetic test fetcher for the HTTP one is a one-argument change.

Fetchers are *factories* (``() -> Fetcher``) because the instance must be
constructed inside the executor task, not pickled with live sockets.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame

FETCH_RESULT_SCHEMA = (
    "url string, status int, mirror string, body binary, error string"
)


class Fetcher(Protocol):
    """One instance per executor partition; may hold live connections."""

    def fetch_many(
        self,
        urls: pd.Series,
        mirrors: pd.Series | None,
        ranges: pd.Series | None = None,
    ) -> pd.DataFrame:
        """Rows aligned with ``urls``: (status, mirror, body, error).
        ``ranges`` rows are (first_byte, last_byte) inclusive or None."""
        ...

    def close(self) -> None: ...


class SyntheticFetcher:
    """Deterministic stand-in used by tests and the sandbox: body is a
    seeded function of the URL (sha256), status always 200. Mirrors are
    recorded as 'synthetic://'."""

    def fetch_many(
        self,
        urls: pd.Series,
        mirrors: pd.Series | None,
        ranges: pd.Series | None = None,
    ) -> pd.DataFrame:
        import hashlib

        bodies = [
            hashlib.sha256(str(u).encode("utf-8")).digest() if u is not None else None
            for u in urls
        ]
        return pd.DataFrame(
            {
                "status": [200] * len(urls),
                "mirror": ["synthetic://"] * len(urls),
                "body": bodies,
                "error": [None] * len(urls),
            }
        )

    def close(self) -> None:
        pass


class HttpRangeFetcher:
    """Real HTTP fetcher with the reference's mirror-failover semantics
    (warccollres.c:718–740): try each mirror in order, first success wins;
    optional byte range (warccollres.c:663–781 fetches the member's
    compressed extent, not the whole archive). Uses a per-instance
    connection-reusing opener. Exercised over real loopback sockets in
    tests/test_fetch.py (range semantics, mirror failover, and the full
    manifest → path-index → range-fetch member re-download); ``opener``
    injection remains for unit tests."""

    def __init__(self, timeout: float = 30.0, opener: Callable | None = None):
        self.timeout = timeout
        if opener is None:  # pragma: no cover - network path
            import urllib.request

            self._opener = urllib.request.build_opener()
            self._open = lambda req: self._opener.open(req, timeout=self.timeout)
        else:
            self._open = opener

    def _fetch_one(self, url, mirror_urls, byte_range=None):
        import urllib.request

        # mirrors arrive as a numpy array through the Arrow batch — no
        # truthiness on it (ambiguous); explicit None/empty handling
        candidates = [url] if mirror_urls is None else list(mirror_urls)
        if not candidates:
            candidates = [url]
        last_err = None
        for mirror in candidates:
            try:
                req = urllib.request.Request(mirror)
                if byte_range is not None:
                    req.add_header("Range", f"bytes={byte_range[0]}-{byte_range[1]}")
                resp = self._open(req)
                body = resp.read()
                status = getattr(resp, "status", 200)
                return status, mirror, body, None
            except Exception as e:  # next mirror (warccollres.c:736–740)
                last_err = f"{mirror}: {type(e).__name__}: {e}"
        return 0, None, None, last_err

    def fetch_many(
        self,
        urls: pd.Series,
        mirrors: pd.Series | None,
        ranges: pd.Series | None = None,
    ) -> pd.DataFrame:
        rows = []
        for i, u in enumerate(urls):
            ms = None if mirrors is None else mirrors.iloc[i]
            rng = None if ranges is None else ranges.iloc[i]
            rows.append(self._fetch_one(u, ms, byte_range=rng))
        return pd.DataFrame(rows, columns=["status", "mirror", "body", "error"])

    def close(self) -> None:
        pass


def fetch_pages(
    scheduled: DataFrame,
    fetcher_factory: Callable[[], Fetcher],
    mirrors_col: str | None = None,
    range_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """(url, [mirror_urls], [offset, length], ...) → + (status, mirror,
    body, error).

    One fetcher per partition (connection reuse), Arrow-batched rows
    through it. Network-bound by design — size partitions to the desired
    per-host concurrency upstream (politeness already bounds per-host
    rows per round).

    ``range_cols=(offset_col, length_col)`` turns each fetch into the
    reference's compressed-extent range GET (warccollres.c:663–781):
    bytes [offset, offset+length-1] inclusive, i.e. exactly the gzip
    member named by a manifest row, instead of the whole archive."""
    in_cols = ["url"] + ([mirrors_col] if mirrors_col else [])
    if range_cols:
        in_cols += list(range_cols)
    src = scheduled.select(*in_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        try:
            for pdf in batches:
                mirrors = pdf[mirrors_col] if mirrors_col else None
                ranges = None
                if range_cols:
                    off, ln = pdf[range_cols[0]], pdf[range_cols[1]]
                    ranges = pd.Series(
                        [
                            None
                            if pd.isna(o) or pd.isna(n)
                            else (int(o), int(o) + int(n) - 1)
                            for o, n in zip(off, ln)
                        ],
                        index=pdf.index,
                        dtype="object",
                    )
                res = fetcher.fetch_many(pdf["url"], mirrors, ranges)
                res.insert(0, "url", pdf["url"].to_numpy())
                yield res
        finally:
            fetcher.close()

    return src.mapInPandas(run, schema=FETCH_RESULT_SCHEMA)


def fetching_link_source(
    fetcher_factory: Callable[[], Fetcher],
) -> Callable[[DataFrame], DataFrame]:
    """Adapter for ``frontier_round(link_graph=...)``: scheduled urls →
    fetch bodies → extract <a href> outlinks. This is the production
    shape of the crawl's fetch stage (SURVEY §2.1 S7); tests use it with
    ``SyntheticFetcher`` to exercise the plumbing without a network."""
    from warcsum_spark.functions.html import extract_links
    from pyspark.sql import functions as F

    def source(scheduled_urls: DataFrame) -> DataFrame:
        fetched = fetch_pages(scheduled_urls, fetcher_factory)
        return fetched.filter(F.col("status") == 200).select(
            "url", extract_links(F.col("body")).alias("outlinks")
        )

    return source

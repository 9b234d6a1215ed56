"""WARC sink — persist fetched pages as standard ``.warc.gz`` archives,
one gzip member per response record (the layout warcsum.c:822–842 walks
and every web-archive tool expects). The reference suite only READS
archives; a crawler also has to WRITE them, and writing them in the
same member-per-record framing means this engine's own scanner (and the
reference tools) can re-ingest its output — the round-trip is pinned in
tests/test_warc_writer.py byte-for-byte through the oracle manifest.

Spark shape: ``mapInPandas`` with one output archive per input
partition — the member chain inside a file is inherently sequential, so
a partition is the natural write unit (mirror of the scan side, where a
file is the natural read unit). Records are framed exactly like the
canonical fixtures: WARC/1.0 header block (Type/Target-URI/Date/
Content-Type/Payload-Digest/Content-Length), HTTP response block,
payload, ``\\r\\n\\r\\n`` member separator, each record its own gzip
member (compresslevel/mtime fixed → byte-deterministic for a given
partitioning). The returned DataFrame is the write manifest (path,
n_records, bytes) — an action on it IS the write (same contract as any
Spark sink).

At 100 TB: archives land at partition grain, so output file size is
controlled by the upstream ``repartition`` — the standard ~1 GB WARC
targets fall out of ordinary partition sizing, and the write needs no
shuffle of its own.
"""

from __future__ import annotations

import gzip
import os
from base64 import b32encode
from collections.abc import Iterator
from hashlib import sha1

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WRITE_MANIFEST_SCHEMA = "path string, n_records long, bytes long"


def _record(uri: str, date: str, payload: bytes, content_type: str) -> bytes:
    """One response record, framed exactly like fixtures._warc_member
    (the layout the scanner and the pure-Python oracle both parse)."""
    http_block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode()
        + b"\r\n\r\n"
    )
    body = http_block + payload
    b32 = b32encode(sha1(payload).digest()).decode().rstrip("=")
    lines = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"WARC-Payload-Digest: sha1:" + b32.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _conversion_record(uri: str, date: str, text: bytes) -> bytes:
    """One WET-style conversion record (the Common-Crawl companion
    format: extracted text re-framed as WARC so the same tooling walks
    it). No HTTP block — the payload IS the converted text."""
    b32 = b32encode(sha1(text).digest()).decode().rstrip("=")
    lines = [
        b"WARC/1.0",
        b"WARC-Type: conversion",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: text/plain",
        b"WARC-Payload-Digest: sha1:" + b32.encode(),
        b"Content-Length: " + str(len(text)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + text + b"\r\n\r\n"


def _metadata_record(uri: str, date: str, payload: bytes) -> bytes:
    """One WAT-style metadata record (WARC-Type: metadata, JSON
    payload) — the framing operators/wat.py writes; parses like any
    WARC member, so the engine scanner re-ingests it."""
    b32 = b32encode(sha1(payload).digest()).decode().rstrip("=")
    lines = [
        b"WARC/1.0",
        b"WARC-Type: metadata",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: application/json",
        b"WARC-Payload-Digest: sha1:" + b32.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _run_partition_writer(src: DataFrame, out_dir: str, prefix: str, suffix: str, record):
    """mapInPandas runner shared by the WARC and WET sinks: one archive
    per non-empty partition, members in row order, null payloads
    skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fh = None
        path = None
        n = 0
        for pdf in batches:
            for uri, payload, date, pid in zip(
                pdf["_uri"], pdf["_payload"], pdf["_date"], pdf["_pid"]
            ):
                if payload is None:
                    continue
                if fh is None:
                    path = os.path.join(
                        out_dir, f"{prefix}-{int(pid):05d}{suffix}"
                    )
                    os.makedirs(out_dir, exist_ok=True)
                    fh = open(path, "wb")
                member = record(str(uri), str(date), payload)
                fh.write(gzip.compress(member, compresslevel=6, mtime=0))
                n += 1
        if fh is None:
            return
        fh.close()
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "bytes": [os.path.getsize(path)]}
        )

    return src.mapInPandas(run, schema=WRITE_MANIFEST_SCHEMA)


def write_wet_archives(
    docs: DataFrame,
    out_dir: str,
    prefix: str = "crawl",
    uri_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    default_date: str = "2015-01-01T00:00:00Z",
) -> DataFrame:
    """T42 — WET sink: extracted text as gzip-member-per-record
    ``.warc.wet.gz`` conversion archives (what Common Crawl ships next
    to every WARC; the input most text pipelines actually read). Same
    partition-grain write and lazy manifest contract as
    ``write_warc_archives``; this engine's own scanner re-ingests the
    output (conversion members parse like any WARC member)."""
    cols = [
        F.col(uri_col).alias("_uri"),
        F.encode(F.col(text_col), "UTF-8").alias("_payload"),
        (
            F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            if date_col
            else F.lit(default_date)
        ).alias("_date"),
        F.spark_partition_id().alias("_pid"),
    ]
    return _run_partition_writer(
        docs.select(*cols),
        out_dir,
        prefix,
        ".warc.wet.gz",
        lambda uri, date, payload: _conversion_record(uri, date, bytes(payload)),
    )


def write_warc_archives(
    pages: DataFrame,
    out_dir: str,
    prefix: str = "crawl",
    uri_col: str = "url",
    payload_col: str = "body",
    date_col: str | None = None,
    content_type: str = "text/html",
    default_date: str = "2015-01-01T00:00:00Z",
) -> DataFrame:
    """Write one ``{prefix}-{partition:05d}.warc.gz`` per non-empty input
    partition under ``out_dir``; returns the lazy write manifest
    (path, n_records, bytes) — run an action on it to execute the write.
    Rows with a null payload are skipped (a failed fetch has nothing to
    archive; gate upstream on ``status`` if stricter is needed)."""
    cols = [
        F.col(uri_col).alias("_uri"),
        F.col(payload_col).alias("_payload"),
        (
            F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            if date_col
            else F.lit(default_date)
        ).alias("_date"),
        F.spark_partition_id().alias("_pid"),
    ]
    return _run_partition_writer(
        pages.select(*cols),
        out_dir,
        prefix,
        ".warc.gz",
        lambda uri, date, payload: _record(
            uri, date, bytes(payload), content_type
        ),
    )

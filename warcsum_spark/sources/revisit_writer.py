"""T57 — dedup-aware WARC sink: duplicate payloads become ``revisit``
records (WARC 1.1 §6.7.2, identical-payload-digest profile) that
reference the first capture instead of storing the body again. This is
the storage half of the reference pipeline's reason to exist: warcsum/
warccollres find the duplicate clusters (warccollres.h:30–36 ext/copy_no
grain, warcsumproc's first-copy refersto) and a production crawler then
writes exactly these revisit records so each payload is stored once.
The sink composes the two: first capture per payload digest → full
response record; every later capture → a payload-less revisit carrying
``WARC-Refers-To-Target-URI``/``WARC-Refers-To-Date`` of the first.

Plan shape at 100 TB: ``plan_revisits`` is ONE digest-keyed exchange —
row_number + first_value share the same window, and the shuffle carries
(digest, url, date) plus the payload that must be written anyway;
there is no self-join. The write itself is the partition-grain
``mapInPandas`` runner pattern shared with the WARC/WET sinks (one
archive per partition, no extra shuffle); archive size = partition
size.
"""

from __future__ import annotations

import gzip
import os
from base64 import b32encode
from collections.abc import Iterator
from hashlib import sha1

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.sources.warc_writer import WRITE_MANIFEST_SCHEMA, _record

REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

DEDUP_MANIFEST_SCHEMA = WRITE_MANIFEST_SCHEMA + ", n_revisits long"


def _revisit_record(
    uri: str,
    date: str,
    payload_digest_b32: str,
    ref_uri: str,
    ref_date: str,
    content_type: str,
) -> bytes:
    """One revisit record: HTTP headers retained, body omitted (the
    identical-payload-digest profile — the digest names the stored
    payload, Refers-To names where it lives)."""
    http_block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type.encode() + b"\r\n\r\n"
    )
    lines = [
        b"WARC/1.0",
        b"WARC-Type: revisit",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Profile: " + REVISIT_PROFILE.encode(),
        b"WARC-Refers-To-Target-URI: " + ref_uri.encode(),
        b"WARC-Refers-To-Date: " + ref_date.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"WARC-Payload-Digest: sha1:" + payload_digest_b32.encode(),
        b"Content-Length: " + str(len(http_block)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + http_block + b"\r\n\r\n"


def plan_revisits(
    pages: DataFrame,
    uri_col: str = "url",
    payload_col: str = "body",
    date_col: str | None = None,
    default_date: str = "2015-01-01T00:00:00Z",
) -> DataFrame:
    """(_uri, _payload, _date, is_first, ref_uri, ref_date): first
    capture per payload sha1 (ordered by date then uri — the
    warcsumproc first-copy rule under a total order) keeps its payload;
    later captures point at it. ONE digest-keyed exchange (row_number
    and both first_values share the window); null payloads pass through
    as is_first (nothing to dedup against). The fixed-format UTC date
    string orders lexicographically == chronologically."""
    date = (
        F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if date_col
        else F.lit(default_date)
    )
    d = pages.select(
        F.col(uri_col).alias("_uri"),
        F.col(payload_col).alias("_payload"),
        date.alias("_date"),
    ).withColumn("_digest", F.sha1(F.col("_payload")))
    w = Window.partitionBy("_digest").orderBy("_date", "_uri")
    return d.select(
        "_uri",
        "_payload",
        "_date",
        (F.col("_digest").isNull() | (F.row_number().over(w) == 1)).alias(
            "is_first"
        ),
        F.first_value("_uri").over(w).alias("ref_uri"),
        F.first_value("_date").over(w).alias("ref_date"),
    )


def write_deduped_archives(
    pages: DataFrame,
    out_dir: str,
    prefix: str = "dedup",
    uri_col: str = "url",
    payload_col: str = "body",
    date_col: str | None = None,
    content_type: str = "text/html",
    default_date: str = "2015-01-01T00:00:00Z",
) -> DataFrame:
    """Write ``{prefix}-{partition:05d}.warc.gz`` archives where each
    distinct payload is stored once and every duplicate capture is a
    revisit record referencing the first. Returns the lazy write
    manifest (path, n_records, bytes, n_revisits) — an action on it IS
    the write."""
    planned = plan_revisits(
        pages, uri_col, payload_col, date_col, default_date
    ).withColumn("_pid", F.spark_partition_id())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fh = None
        path = None
        n = 0
        n_rev = 0
        for pdf in batches:
            for uri, payload, dt, is_first, ref_uri, ref_date, pid in zip(
                pdf["_uri"],
                pdf["_payload"],
                pdf["_date"],
                pdf["is_first"],
                pdf["ref_uri"],
                pdf["ref_date"],
                pdf["_pid"],
            ):
                if payload is None:
                    continue
                if fh is None:
                    path = os.path.join(
                        out_dir, f"{prefix}-{int(pid):05d}.warc.gz"
                    )
                    os.makedirs(out_dir, exist_ok=True)
                    fh = open(path, "wb")
                if is_first:
                    member = _record(str(uri), str(dt), bytes(payload), content_type)
                else:
                    b32 = (
                        b32encode(sha1(bytes(payload)).digest())
                        .decode()
                        .rstrip("=")
                    )
                    member = _revisit_record(
                        str(uri),
                        str(dt),
                        b32,
                        str(ref_uri),
                        str(ref_date),
                        content_type,
                    )
                    n_rev += 1
                fh.write(gzip.compress(member, compresslevel=6, mtime=0))
                n += 1
        if fh is None:
            return
        fh.close()
        yield pd.DataFrame(
            {
                "path": [path],
                "n_records": [n],
                "bytes": [os.path.getsize(path)],
                "n_revisits": [n_rev],
            }
        )

    return planned.mapInPandas(run, schema=DEDUP_MANIFEST_SCHEMA)


def parse_archive(path: str) -> list[dict]:
    """Pure-Python oracle parser for the round-trip tests: walk gzip
    members, split WARC headers, return [{type, uri, date, headers,
    body}] — independent of the engine scanner."""
    import zlib

    out = []
    with open(path, "rb") as f:
        blob = f.read()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(31)
        member = d.decompress(blob[pos:])
        pos = len(blob) - len(d.unused_data)
        head, _, rest = member.partition(b"\r\n\r\n")
        lines = head.split(b"\r\n")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b": ")
            hdrs[k.decode()] = v.decode()
        out.append(
            {
                "type": hdrs["WARC-Type"],
                "uri": hdrs["WARC-Target-URI"],
                "date": hdrs["WARC-Date"],
                "headers": hdrs,
                "body": rest[: int(hdrs["Content-Length"])],
            }
        )
    return out

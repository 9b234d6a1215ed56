"""T37 — CDX(J) web-archive index generation: the standard lookup
index every web archive builds next to its WARC files (what makes
"give me page X as of time T" a seek instead of a scan). The reference
suite stops at the digest manifest (warcsum.c:1 manifest columns:
file/offset/length/uri/date/digest); a production archive derives the
CDX from exactly those columns, so this operator closes the
manifest→index step Spark-first.

Key design points:

* **urlkey is a SURT** (Sort-friendly URI Reordering Transform,
  the convention of the IIPC CDX spec and pywb/OpenWayback): host
  labels reversed and comma-joined, then ``)`` + lowercased
  path?query, scheme and port dropped, one optional leading ``www.``
  stripped. SURT keys make one host's records — and one *domain*'s
  subdomains — lexicographically contiguous, which is the entire point
  of the index: a per-host range scan instead of a full-file grep.
* **Everything is a JVM expression** (regexp + split/reverse/
  array_join): no Python in the plan, fully codegen'd, and each piece
  has an exact DuckDB twin so the driver oracle can recompute the
  whole index.
* **The DataFrame form is unsorted** — Spark's shuffle already
  hash-partitions it for downstream joins, and forcing a global sort
  on an intermediate would be a scale bug. The global
  (urlkey, timestamp) order the on-disk CDX format requires happens
  only in ``cdx_text_lines`` (export tier), same split as the digest
  manifest's text export (operators/digest_manifest.py:56).

At 10^10 records: map-only until the export sort; the export itself is
a range-partitioned sort on a slim (urlkey, ts, 5 scalars) projection —
payload bytes never enter this plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# after scheme strip: host[:port] then optional /path?query
_HOST_RE = r"^([^/:]+)(:[0-9]+)?"
_PATH_RE = r"^[^/]*(/.*)?$"


def surt_key(url: Column) -> Column:
    """SURT urlkey for one URL column (JVM-only expression).

    ``http://www.News.Example.COM:8080/A/B?q=1#f`` →
    ``example,news)/a/b?q=1``.
    """
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.lower(F.regexp_extract(rest, _PATH_RE, 1))
    path = F.regexp_replace(path, r"#.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )


def cdx_index(
    records: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    filename_col: str = "warcfile",
    offset_col: str = "offset",
    length_col: str = "length",
    digest_col: str = "digest",
    mime_col: str | None = None,
    status_col: str | None = None,
) -> DataFrame:
    """(urlkey, timestamp, url, digest, filename, offset, length
    [, mime, status]) — one CDX row per capture. ``timestamp`` is the
    14-digit CDX form (yyyyMMddHHmmss, UTC session)."""
    cols = [
        surt_key(F.col(url_col)).alias("urlkey"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("timestamp"),
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("digest"),
        F.col(filename_col).alias("filename"),
        F.col(offset_col).cast("long").alias("offset"),
        F.col(length_col).cast("long").alias("length"),
    ]
    if mime_col is not None:
        cols.append(F.col(mime_col).alias("mime"))
    if status_col is not None:
        cols.append(F.col(status_col).cast("int").alias("status"))
    return records.select(*cols)


def cdx_text_lines(index: DataFrame) -> DataFrame:
    """Export tier: the classic space-separated 7-field CDX line, in
    global (urlkey, timestamp) order — a range-partitioned sort on slim
    rows, exactly like the digest manifest's text export."""
    fields = [
        F.col("urlkey"),
        F.col("timestamp"),
        F.col("url"),
        F.col("digest"),
        F.col("filename"),
        F.col("offset").cast("string"),
        F.col("length").cast("string"),
    ]
    return (
        index.orderBy("urlkey", "timestamp", "url")
        .select(F.concat_ws(" ", *fields).alias("line"))
    )

"""T103 — content-based mirror-host detection (Bharat & Broder WWW
1999, "Mirror, mirror on the Web: a study of host pairs with
replicated content"; Bharat, Broder, Dean & Henzinger JASIS 2000 for
the comparison of techniques — this implements their exact
path+fingerprint "shingles of the URL set" family, the precise tier).

Why a crawl engine wants it: mirrors are the HOST-granularity
duplication that URL rules (T45 DUST) and link co-citation (T99)
each see only half of — a mirror pair serves the SAME content at the
SAME paths under different hostnames. Detecting them collapses crawl
budget (fetch one replica), dedup work (whole-host instead of
per-document), and link-graph distortion (mirror rings inflate T32/
T55 scores). T1 finds duplicate DOCUMENTS; this aggregates the same
evidence to host pairs.

Pinned, engine-portable semantics:

* input rows (host, path, fingerprint) — one per crawled document;
  the caller supplies the content fingerprint (md5 of extracted text
  is the repo convention). Rows are deduplicated first: a host
  asserts each (path, fp) fact once;
* a (path, fp) key present on more than ``max_hosts`` hosts is
  DROPPED before pairing (the ubiquity cap: an empty page or shared
  boilerplate present on 10^5 hosts says nothing about mirroring and
  would alone mint 10^10 pairs — the same cap-is-definition
  discipline as T99's referrer fan-out and T65's degree cap, applied
  identically in the oracle);
* host sizes for the resemblance denominator are counted over the
  SAME capped set (self-consistency — pinned):
  ``resemblance = shared / (size_a + size_b - shared)`` — exact
  integers, ONE IEEE division, rounded to 6;
* output host pairs (host_a < host_b) with ``shared >= min_shared``.

Plan shape at 100 TB: dedupe + ubiquity filter are one map-side-
combined agg + one slim semi-join; pairing is the single self-join
on the (path, fp) key — a key on h <= max_hosts hosts emits
h(h-1)/2 pairs, so the blow-up is bounded by max_hosts^2 per key,
the standard sub-quadratic shape. Then ONE pair-grain exchange with
map-side combine. Document text never enters: the operator consumes
fingerprints. No windows, no collects, no Python.

No reference counterpart; the technique is the published one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_hosts(
    docs: DataFrame,
    min_shared: int = 2,
    max_hosts: int = 16,
    host_col: str = "host",
    path_col: str = "path",
    fp_col: str = "fp",
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, resemblance) with
    host_a < host_b — see module docstring for the pinned semantics."""
    d = docs.select(
        F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
        F.col(fp_col).alias("fp"),
    ).distinct()
    spread = d.groupBy("path", "fp").agg(F.count("*").alias("_h"))
    capped = d.join(
        spread.filter(F.col("_h") <= max_hosts).select("path", "fp"),
        ["path", "fp"],
        "left_semi",
    )
    sizes = capped.groupBy("host").agg(F.count("*").alias("size"))
    left = capped.select("path", "fp", F.col("host").alias("host_a"))
    right = capped.select("path", "fp", F.col("host").alias("host_b"))
    pairs = (
        left.join(right, ["path", "fp"])
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = pairs.join(
        sizes.select(F.col("host").alias("host_a"), F.col("size").alias("size_a")),
        "host_a",
    ).join(
        sizes.select(F.col("host").alias("host_b"), F.col("size").alias("size_b")),
        "host_b",
    )
    union = F.col("size_a") + F.col("size_b") - F.col("shared")
    return out.select(
        "host_a",
        "host_b",
        "shared",
        "size_a",
        "size_b",
        F.round(
            F.col("shared").cast("double") / union.cast("double"), 6
        ).alias("resemblance"),
    )


def mirror_hosts_sql(
    docs_sql: str, min_shared: int = 2, max_hosts: int = 16
) -> str:
    """The IDENTICAL pinned semantics for DuckDB over ``docs_sql``
    (a SELECT producing (host, path, fp))."""
    return f"""
WITH d AS (SELECT DISTINCT host, path, fp FROM ({docs_sql})),
spread AS (SELECT path, fp, count(*)::BIGINT AS h FROM d GROUP BY path, fp),
capped AS (
  SELECT d.host, d.path, d.fp FROM d JOIN spread USING (path, fp)
  WHERE spread.h <= {max_hosts}
),
sizes AS (SELECT host, count(*)::BIGINT AS size FROM capped GROUP BY host),
pairs AS (
  SELECT l.host AS host_a, r.host AS host_b, count(*)::BIGINT AS shared
  FROM capped l JOIN capped r ON l.path = r.path AND l.fp = r.fp
    AND l.host < r.host
  GROUP BY l.host, r.host
  HAVING count(*) >= {min_shared}
)
SELECT p.host_a, p.host_b, p.shared, sa.size AS size_a, sb.size AS size_b,
  round(CAST(p.shared AS DOUBLE)
        / CAST(sa.size + sb.size - p.shared AS DOUBLE), 6) AS resemblance
FROM pairs p
JOIN sizes sa ON p.host_a = sa.host
JOIN sizes sb ON p.host_b = sb.host
"""

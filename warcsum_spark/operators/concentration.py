"""T97 — crawl concentration diagnostics: the Herfindahl–Hirschman
index and the Gini coefficient of documents-per-host (HHI: Herfindahl
1950/Hirschman 1945, the standard market-concentration index; Gini
1912 via the rank-covariance identity — see Dorfman, Rev. Econ. Stat.
1979 for the closed form used here).

Why a crawl engine wants them: a healthy broad crawl spreads fetches
across hosts; a trap, a misconfigured seed list, or a broken
politeness budget concentrates it. HHI and Gini are the two standard
one-number answers to "how concentrated is this corpus by host", read
together (HHI is dominated by the biggest hosts, Gini by the shape of
the whole tail). Corpus datasheets report exactly this; T36's budget
apportionment and T73's domain gates consume it as the before/after
evidence.

Pinned, engine-portable definitions over per-host doc counts c_h
(h = 1..n ranked ascending by (c, host) — ties are sum-invariant, the
order is pinned anyway for determinism):

* ``hhi = Σc² / (Σc)²`` — in [1/n, 1]; ×10000 is the antitrust scale,
  not applied here;
* ``gini = (2·Σ(rank·c) − (n+1)·Σc) / (n·Σc)`` — the Dorfman
  rank form, in [0, 1−1/n];
* ``max_share = max(c) / Σc``.

Every sum is over INTEGERS accumulated exactly in DECIMAL(38,0) /
HUGEINT (the zipf.py discipline with no ln at all); the only IEEE ops
are the three pinned final divisions, rounded to 6 — bit-identical
cross-engine and partitioning-proof.

Plan shape at 100 TB: ONE corpus-grain exchange (groupBy host, map-
side combinable); the rank over the host table reuses the
docid_remap.py range-partition + offset discipline (url_sort_ids with
the count as the sort key) — never a single-partition corpus window
even when "hosts" is itself large; then one scalar aggregate.

No reference counterpart; the indices are the published ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.docid_remap import url_sort_ids

_DEC = "decimal(38,0)"


def host_concentration(
    docs: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """ONE row: (n_hosts, n_docs, hhi, gini, max_share). See module
    docstring for the pinned arithmetic."""
    counts = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # global ascending rank by (c, host) without a global window —
    # url_sort_ids ranks by (url_col, id_col); 0-based → rank = new_id+1
    ranked = counts.join(
        url_sort_ids(counts, url_col="c", id_col="host").select(
            F.col("old_id").alias("host"),
            (F.col("new_id") + 1).alias("rank"),
        ),
        "host",
    )
    c = F.col("c").cast(_DEC)
    r = F.col("rank").cast(_DEC)
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum(c).alias("s_c"),
        F.sum(c * c).alias("s_cc"),
        F.sum(r * c).alias("s_rc"),
        F.max("c").alias("c_max"),
    )
    n = F.col("n_hosts").cast(_DEC)
    sc = F.col("s_c")
    gini_num = (F.lit(2).cast(_DEC) * F.col("s_rc")) - (
        (n + F.lit(1).cast(_DEC)) * sc
    )
    return sums.select(
        F.col("n_hosts"),
        sc.cast("long").alias("n_docs"),
        F.round(
            F.col("s_cc").cast("double") / (sc.cast("double") * sc.cast("double")),
            6,
        ).alias("hhi"),
        F.round(
            gini_num.cast("double") / (n * sc).cast("double"), 6
        ).alias("gini"),
        F.round(
            F.col("c_max").cast("double") / sc.cast("double"), 6
        ).alias("max_share"),
    )


def host_concentration_sql(docs_sql: str, host_col: str = "host") -> str:
    """The IDENTICAL pinned arithmetic for DuckDB; ``docs_sql``
    selects rows carrying ``host_col``. The oracle ranks with the
    plain global window the engine refuses."""
    return f"""
WITH counts AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS c
  FROM ({docs_sql}) GROUP BY {host_col}
), ranked AS (
  SELECT host, c,
         row_number() OVER (ORDER BY c, host) AS rank
  FROM counts
), sums AS (
  SELECT count(*)::BIGINT AS n_hosts,
         sum(CAST(c AS HUGEINT)) AS s_c,
         sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s_cc,
         sum(CAST(rank AS HUGEINT) * CAST(c AS HUGEINT)) AS s_rc,
         max(c) AS c_max
  FROM ranked
)
SELECT n_hosts, CAST(s_c AS BIGINT) AS n_docs,
  round(CAST(s_cc AS DOUBLE)
        / (CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)), 6) AS hhi,
  round(CAST((CAST(2 AS HUGEINT) * s_rc)
             - ((CAST(n_hosts AS HUGEINT) + 1) * s_c) AS DOUBLE)
        / CAST(CAST(n_hosts AS HUGEINT) * s_c AS DOUBLE), 6) AS gini,
  round(CAST(c_max AS DOUBLE) / CAST(s_c AS DOUBLE), 6) AS max_share
FROM sums
"""

"""T93 — compression-aware doc-ID reassignment: renumber documents by
URL lexicographic rank and measure the posting-gap savings (Silvestri
ECIR 2007, "Sorting out the document identifier assignment problem":
URL-sorted ids put same-site — hence vocabulary-correlated — documents
on adjacent ids, shrinking inverted-index d-gaps; the trick behind the
compact public web-index layouts, and the reason CDX/WARC tooling
keeps SURT order).

This is the action half of T92's accounting: T92 prices the index
under the ids you have; this operator produces the ids you SHOULD
have and quantifies the delta, per term, in exact bits.

Pinned semantics:

* ``new_id = rank − 1`` where rank is ``row_number`` over the unique
  total order ``(url ASC, old_id ASC)`` — 0-based, dense, a
  permutation of the corpus;
* the report joins T92's per-term γ/δ bit totals computed under old
  ids and under new ids (same index prep, same hot-term cap) —
  ``saved_gamma_bits = gamma_old − gamma_new`` (exact integers).

Plan shape at 100 TB — the global URL rank WITHOUT a global
single-partition sort (the distributed-sort discipline, same offsets
idiom as shuffle.py's two-level permutation):

1. ``repartitionByRange(url, old_id)`` — the one range exchange,
   carrying only (old_id, url): non-overlapping ordered partitions;
2. ``row_number`` within each range partition (keyed by
   ``spark_partition_id``) ordered by (url, old_id);
3. partition sizes → running-sum offsets: a window over the
   ≤ n_partitions dimension table only, broadcast back (never a
   corpus-grain window);
4. global rank = offset + local position — exact wherever the sampled
   range boundaries fall, because the (url, old_id) order is total.

The rank attach back to documents is one slim (old_id, new_id) join.
Everything else reuses T30/T92, which carry their own scale stories.

No reference counterpart; the assignment problem and the URL-sort
solution are the published ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_sort_ids(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """(old_id, new_id): 0-based dense ids in (url, old_id) order —
    computed with the range-partition + per-partition rank + offset
    discipline (module docstring), never a global window."""
    slim = docs.select(
        F.col(id_col).alias("old_id"), F.col(url_col).alias("_url")
    )
    if n_parts:
        slim = slim.repartitionByRange(n_parts, "_url", "old_id")
    else:
        slim = slim.repartitionByRange("_url", "old_id")
    parts = slim.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("_url", "old_id")
    # cached: the per-partition sizes aggregate AND the final offset join
    # both consume the ranked frame — uncached each re-runs the range
    # exchange (with its sampling pass) and the window. Results don't
    # depend on the cache: new_id = offset + local pos - 1 is the global
    # (url, old_id) rank, invariant to where the range boundaries fall.
    local = parts.withColumn("_lpos", F.row_number().over(w)).cache()
    sizes = local.groupBy("_pid").agg(F.max("_lpos").alias("_n"))
    offsets = sizes.select(
        "_pid",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        "old_id",
        (F.col("_off") + F.col("_lpos") - 1).cast("long").alias("new_id"),
    )


def reassignment_report(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int | None = None,
) -> DataFrame:
    """(term, df, gamma_old, gamma_new, delta_old, delta_new,
    saved_gamma_bits) — T30 index + T92 costs under the original ids
    vs under URL-sorted ids. Hot-capped terms carry NULLs on both
    sides (same df either way — the remap is a permutation)."""
    from warcsum_spark.operators.inverted_index import (
        index_from_pairs,
        term_doc_pairs,
    )
    from warcsum_spark.operators.postings import postings_compression

    def costs(pairs: DataFrame, tag: str) -> DataFrame:
        ix = index_from_pairs(pairs, id_col=id_col, max_postings=max_postings)
        c = postings_compression(ix)
        return c.select(
            "term",
            "df",
            F.col("gamma_bits").alias(f"gamma_{tag}"),
            F.col("delta_bits").alias(f"delta_{tag}"),
        )

    # tokenize ONCE: both cost sides index the SAME corpus, only the id
    # assignment differs (the remap is a permutation), so the old side's
    # (term, doc, count) pair table re-keys to the new ids with one slim
    # join instead of a second full tokenize+explode pass. Cached: the
    # old index, the re-key join, and the window all consume it.
    pairs = term_doc_pairs(
        docs.select(id_col, text_col), id_col=id_col, text_col=text_col
    ).cache()
    old = costs(pairs, "old")
    ids = url_sort_ids(docs, url_col=url_col, id_col=id_col)
    pairs_new = (
        pairs.withColumnRenamed(id_col, "old_id")
        .join(ids, "old_id")
        .select("term", F.col("new_id").alias(id_col), "_tc")
    )
    new = costs(pairs_new, "new").drop("df")
    return old.join(new, "term").select(
        "term",
        "df",
        "gamma_old",
        "gamma_new",
        "delta_old",
        "delta_new",
        (F.col("gamma_old") - F.col("gamma_new")).alias("saved_gamma_bits"),
    )


def reassignment_sql(docs_cte: str, cap: int) -> str:
    """The full DuckDB twin for ``reassignment_report`` over
    ``docs_cte`` — a named CTE body ``docs AS (SELECT doc_id, url,
    text …)``. Tokenization is the T30 oracle's (whitespace-normalize,
    no case fold); the bit arithmetic is T92's pinned closed forms;
    the remap is the plain global window the distributed version
    refuses to run (the oracle is allowed to)."""

    def side(tag: str, toks: str) -> str:
        return f"""ix_{tag} AS (
  SELECT term, count(DISTINCT doc_id) AS df,
         CASE WHEN count(DISTINCT doc_id) <= {cap}
              THEN list(DISTINCT doc_id ORDER BY doc_id) END AS postings
  FROM {toks} GROUP BY term
), bits_{tag} AS (
  SELECT term, length(bin(g)) AS w FROM (
    SELECT term,
           p - coalesce(lag(p) OVER (PARTITION BY term ORDER BY i), -1)
             AS g
    FROM (SELECT term, unnest(postings) AS p,
                 generate_subscripts(postings, 1) AS i
          FROM ix_{tag} WHERE postings IS NOT NULL)
  )
), cost_{tag} AS (
  SELECT i.term, i.df,
    CAST(sum(2 * (w - 1) + 1) AS BIGINT) AS gamma_{tag},
    CAST(sum((w - 1) + (2 * (length(bin(w)) - 1) + 1)) AS BIGINT)
      AS delta_{tag}
  FROM ix_{tag} i LEFT JOIN bits_{tag} b USING (term)
  GROUP BY i.term, i.df
)"""

    return f"""
WITH {docs_cte},
nrm AS (
  SELECT doc_id, url,
         trim(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
  FROM docs
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS term
  FROM nrm WHERE t <> ''
), idmap AS (
  SELECT doc_id AS old_id,
         row_number() OVER (ORDER BY url, doc_id) - 1 AS new_id
  FROM docs
), toks_new AS (
  SELECT m.new_id AS doc_id, term
  FROM toks JOIN idmap m ON toks.doc_id = m.old_id
),
{side('old', 'toks')},
{side('new', 'toks_new')}
SELECT o.term, o.df, o.gamma_old, n.gamma_new, o.delta_old,
       n.delta_new, o.gamma_old - n.gamma_new AS saved_gamma_bits
FROM cost_old o JOIN cost_new n USING (term)
"""

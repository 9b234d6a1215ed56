"""T123 — I-Match duplicate detection (Chowdhury, Frieder, Grossman
& McCabe, "Collection statistics for fast duplicate document
detection", ACM TOIS 20(2) 2002 — the collection-statistics dedup:
a document's signature is ONE hash of its lexicon-filtered term set,
where the lexicon keeps mid-idf terms and drops both ubiquitous terms
(no discrimination) and rare terms (typos, counters, boilerplate
serial numbers). Documents that differ only in dropped terms collapse
to the same signature — a single exact group-by catches the
"identical but for the timestamp/session-id" duplicates that byte
digests (F1) miss, at a fraction of MinHash's (T1) cost; its
announced failure mode is its strength boundary: one mid-idf edit
changes the signature, which is what T1/T118 are for).

Pinned definitions (cross-engine exact):

* tokenization: ASCII-whitespace split of lower(trim(text)), empty
  tokens dropped — the corpus tokenizer contract shared with T9/T23;
* per-term df over DISTINCT (doc, term) pairs; n = corpus size;
* lexicon: min_df ≤ df AND df·max_df_den ≤ n·max_df_num — both ends
  EXACT integer comparisons (no idf floats at all: an idf band
  [a, b] is equivalent to a df band, so the float log never needs to
  be computed);
* signature = sha256 of the doc's DISTINCT kept terms joined by a
  single space in lexicographic (binary UTF-8) order — Spark's
  string sort and DuckDB's default collation agree byte-for-byte
  (the paper used SHA-1; sha256 is the digest both engines expose
  with identical hex output, noted as the one deviation);
* docs with an EMPTY filtered term set have no signature and are
  excluded (the paper's degenerate case);
* group_size / canonical_id (min doc_id) / is_dup per signature.

Plan shape at 100 TB: one (doc, term)-distinct token exchange feeds
BOTH the df aggregate and the signature stage (Catalyst shares the
scan); df attaches back by a term-keyed join (vocabulary-grain — at
web scale the vocab table is itself large, so this is a slim
(term, long) hash join, never a broadcast of the corpus); the doc
signature is one doc-keyed collect_set + in-row sort/concat/hash;
the group stats are one signature-keyed map-side-combinable
aggregate broadcast... joined back as a slim (sig, long, long) table.
Text never shuffles — only terms and 64-hex signatures.

Reference anchor: warcsum.c:881–1011 standardizes whole-payload
digests; this is the term-set digest the same manifest consumer can
group on. §2.12 dedup family, sibling of T1/T115/T118.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def imatch_signatures(
    docs: DataFrame,
    min_df: int = 2,
    max_df_num: int = 1,
    max_df_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, signature, group_size, canonical_id, is_dup) for every
    document with a non-empty lexicon-filtered term set; see module
    docstring for the pinned definitions."""
    if min_df < 1:
        raise ValueError(f"min_df must be ≥ 1, got {min_df}")
    if max_df_num < 1 or max_df_den < 1:
        raise ValueError(
            f"max_df fraction must be positive: {max_df_num}/{max_df_den}"
        )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    terms = (
        base.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+")
                )
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    n1 = base.agg(F.count(F.lit(1)).alias("_n"))
    df_tbl = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    lexicon = (
        df_tbl.crossJoin(F.broadcast(n1))
        .filter(
            (F.col("_df") >= F.lit(int(min_df)))
            & (
                F.col("_df") * F.lit(int(max_df_den))
                <= F.col("_n") * F.lit(int(max_df_num))
            )
        )
        .select("term")
    )
    kept = terms.join(lexicon, "term")
    sigs = kept.groupBy("doc_id").agg(
        F.sha2(
            F.concat_ws(" ", F.sort_array(F.collect_set("term"))), 256
        ).alias("signature")
    )
    groups = sigs.groupBy("signature").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("canonical_id"),
    )
    return sigs.join(groups, "signature").select(
        "doc_id",
        "signature",
        "group_size",
        "canonical_id",
        (F.col("group_size") >= F.lit(2)).alias("is_dup"),
    )


def imatch_oracle_sql(
    docs_sql: str,
    min_df: int = 2,
    max_df_num: int = 1,
    max_df_den: int = 10,
) -> str:
    """The identical pinned pipeline in DuckDB over ``docs_sql``
    (a SELECT yielding doc_id, text)."""
    return f"""
WITH base AS ({docs_sql}),
terms AS (
  SELECT DISTINCT doc_id, t.term
  FROM base,
       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
         AS t(term)
  WHERE t.term <> ''
),
n AS (SELECT count(*)::BIGINT AS n FROM base),
df AS (SELECT term, count(*)::BIGINT AS df FROM terms GROUP BY term),
lexicon AS (
  SELECT term FROM df, n
  WHERE df >= {int(min_df)}
    AND df * {int(max_df_den)} <= n * {int(max_df_num)}
),
sigs AS (
  SELECT doc_id,
         sha256(string_agg(terms.term, ' ' ORDER BY terms.term))
           AS signature
  FROM terms JOIN lexicon USING (term)
  GROUP BY doc_id
),
groups AS (
  SELECT signature, count(*)::BIGINT AS group_size,
         min(doc_id) AS canonical_id
  FROM sigs GROUP BY signature
)
SELECT s.doc_id, s.signature, g.group_size, g.canonical_id,
       (g.group_size >= 2) AS is_dup
FROM sigs s JOIN groups g USING (signature)
"""

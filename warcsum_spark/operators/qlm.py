"""T114 — query-likelihood retrieval with Dirichlet smoothing (Zhai &
Lafferty, SIGIR 2001): the language-modeling counterpart to T69's BM25.

Each document is a unigram LM smoothed toward the collection model;
a query scores by log p(q|d). The standard rank-equivalent sum-decompo-
sition keeps the computation sparse — only MATCHED (term, doc) pairs
carry a term contribution:

    score(q, d) = Σ_{t ∈ q∩d} c(t,q) · ln(1 + tf(t,d) / (μ · cf(t)/|C|))
                  + |q| · ln(μ / (doclen(d) + μ))

(Zhai & Lafferty eq. 6 with p_s(t|d) the Dirichlet estimator.) Docs
matching zero query terms are not returned — the per-doc length term
alone never lifts an empty match into a meaningful rank, and scoring
the whole corpus for it would be a full-table pass per query.

Scale design is T69's verbatim (shared `_tokens_with_len`): broadcast
query-vocabulary semi-join BEFORE the only token-grain exchange; tf and
doclen share that exchange; collection frequency cf(t) comes from the
filtered stream (the vocab filter keeps every occurrence of a surviving
term, so cf is exact) and is vocabulary-sized → broadcast back; |C| is
sum(doclen) from the same one-row broadcast aggregate that BM25 uses
for avgdl — never a collect. Scoring is one slim (query_id, doc_id)
exchange, with the same optional two-phase salted top-k for
stopword-hot queries.

Float pinning follows bm25.py: doubles throughout, round(score, 6) at
the OUTPUT only, rank window ordered by the rounded score with a
doc_id tiebreak — engine-exact against the DuckDB twin.

Reference anchor: none (warcsum's unit is the WARC record,
warcsum.c:881–1011); §2.12 training-data retrieval surface, sibling of
T69/T91.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.operators.bm25 import _doc_lengths, _tokens_with_len


def query_likelihood_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    mu: float = 2000.0,
    salt_buckets: int = 0,
) -> DataFrame:
    """Top-``k`` documents per query by Dirichlet-smoothed query
    likelihood. ``queries`` is a dimension-sized (query_id, term)
    table — duplicate term rows act as query-term multiplicity c(t,q).
    Returns (query_id, doc_id, score, rank); only documents matching
    ≥1 query term are candidates."""
    qterms = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").cast("string").alias("term"),
    )
    # c(t,q) multiplicity and |q| length — both dimension-sized
    qtf = qterms.groupBy("query_id", "term").agg(
        F.count("*").cast("double").alias("qtf")
    )
    qlen = qterms.groupBy("query_id").agg(
        F.count("*").cast("double").alias("qlen")
    )
    vocab = qtf.select("term").distinct()

    # |C| (total corpus tokens): one-row aggregate, broadcast back
    stats = _doc_lengths(docs, id_col, text_col).agg(
        F.sum("doclen").cast("double").alias("_c_total")
    )

    toks = _tokens_with_len(docs, id_col, text_col)
    matched = toks.join(F.broadcast(vocab), "term", "inner")
    # cached: cf aggregate + scoring join both consume the pair table
    # (see bm25.py — uncached each re-runs tokenize/explode/vocab join)
    pairs = matched.groupBy("term", id_col).agg(
        F.count("*").cast("double").alias("tf"),
        F.max("doclen").cast("double").alias("doclen"),
    ).cache()

    # cf over the filtered pairs is exact (vocab filter keeps every
    # occurrence of a surviving term); vocabulary-sized → broadcast
    cf_tbl = pairs.groupBy("term").agg(F.sum("tf").alias("cf"))

    term_part = (
        pairs.join(F.broadcast(cf_tbl), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qtf), "term")
        .select(
            "query_id",
            F.col(id_col),
            F.col("doclen"),
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + F.col("tf")
                    / (F.lit(float(mu)) * F.col("cf") / F.col("_c_total"))
                )
            ).alias("_c"),
        )
    )
    scores = (
        term_part.groupBy("query_id", id_col)
        .agg(
            F.sum("_c").alias("_match"),
            F.max("doclen").alias("_doclen"),
        )
        .join(F.broadcast(qlen), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                F.col("_match")
                + F.col("qlen")
                * F.log(
                    F.lit(float(mu)) / (F.col("_doclen") + F.lit(float(mu)))
                ),
                6,
            ).alias("score"),
        )
    )

    order = [F.col("score").desc(), F.col(id_col).asc()]
    if salt_buckets and salt_buckets > 1:
        salted = scores.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), salt_buckets)
        )
        w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
        survivors = (
            salted.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_salt", "_r1")
        )
    else:
        survivors = scores
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def query_likelihood_sql(
    docs_cte: str,
    query_values: list[tuple[int, str]],
    k: int = 10,
    mu: float = 2000.0,
) -> str:
    """DuckDB twin of ``query_likelihood_search`` — identical
    tokenization, decomposition, and output rounding. ``docs_cte``
    yields (doc_id, text); ``query_values`` is the (query_id, term)
    list inlined as VALUES."""
    vals = ", ".join(f"({q}, '{t}')" for q, t in query_values)
    m = float(mu)
    return rf"""
WITH q(query_id, term) AS (VALUES {vals}),
qtf AS (
  SELECT query_id, term, CAST(count(*) AS DOUBLE) AS qtf
  FROM q GROUP BY query_id, term
), qlen AS (
  SELECT query_id, CAST(count(*) AS DOUBLE) AS qlen FROM q GROUP BY query_id
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
  FROM ({docs_cte})
), toks AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(t, ' ') END AS w
  FROM norm
), stats AS (
  SELECT CAST(sum(len(w)) AS DOUBLE) AS c_total FROM toks
), stream AS (
  SELECT doc_id, CAST(len(w) AS DOUBLE) AS doclen, unnest(w) AS term
  FROM toks
), pairs AS (
  SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf,
         max(doclen) AS doclen
  FROM stream
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY term, doc_id
), cf AS (
  SELECT term, sum(tf) AS cf FROM pairs GROUP BY term
), term_part AS (
  SELECT qtf.query_id, p.doc_id, p.doclen,
         qtf.qtf * ln(1.0 + p.tf / ({m!r} * cf.cf / s.c_total)) AS c
  FROM pairs p
  JOIN cf USING (term)
  JOIN qtf ON qtf.term = p.term
  CROSS JOIN stats s
), scores AS (
  SELECT tp.query_id, tp.doc_id,
         round(sum(tp.c)
               + any_value(ql.qlen)
                 * ln({m!r} / (max(tp.doclen) + {m!r})), 6) AS score
  FROM term_part tp
  JOIN qlen ql ON ql.query_id = tp.query_id
  GROUP BY tp.query_id, tp.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rnk
  FROM scores
)
SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= {int(k)}
"""

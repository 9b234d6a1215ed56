"""T126 — TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004
"TextRank: bringing order into text" — PageRank over the word
co-occurrence graph: words that co-occur within a small window vote
for each other, and the stationary scores surface the corpus's
keyword vocabulary without any training. The unsupervised keyword
layer beside TF-IDF's (T23) frequency ranking and the taxonomy
tagger's (T58) fixed lexicons: TF-IDF scores a word by rarity,
TextRank by the CENTRALITY of its co-occurrence neighborhood, which
is why it keeps multi-word technical vocabulary that idf drowns).

Pinned, engine-portable definitions:

* tokens: the shared ASCII-whitespace corpus contract (lowercase,
  WS_CLASS-collapsed); every token is a vertex (the paper filters to
  nouns/adjectives via a POS tagger — no tagger in this stack; the
  all-tokens graph is the pinned deviation, noted here);
* edges: DISTINCT unordered pairs {a, b}, a ≠ b, of tokens
  co-occurring within positional distance ≤ ``window`` in the SAME
  document, canonicalized (least, greatest) and materialized in BOTH
  directions, so the directed PageRank over them IS the paper's
  undirected walk (out-degree = undirected degree);
* scores: the repo's gate-proven T32 ``pagerank`` engine verbatim —
  uniform start, uniform teleport, per-round round-10 quantization
  (pinned deviation from the paper's (1−d) constant teleport form:
  the classic normalized formulation, identical fixed point up to
  the uniform factor on connected graphs);
* output: the top ``k`` rows by (score DESC, word ASC) — the
  deterministic total order — with pos = 1..k.

Plan shape at 100 TB: pair extraction is ROW-LOCAL (nested
higher-order functions over the token array — no Generate carrying
the array, the 2c9cd06 lesson); the exploded pair stream collapses
in a map-side-combinable DISTINCT before joining anything, so the
iteration operates on the vocabulary-co-occurrence grain (≪ corpus
grain: the distinct-pair table grows with vocabulary, not tokens).
Each PageRank round is one edge join + one aggregate with
localCheckpoint lineage cuts (T32 discipline); the final top-k is a
TakeOrderedAndProject with the rank window running on ≤ k rows.

No reference counterpart (warcsum has no text analysis). §2.12 text
family, sibling of T23/T58/T9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import WS_CLASS
from warcsum_spark.operators.pagerank import pagerank, pagerank_oracle_sql


def _pair_array_expr(window: int) -> str:
    """Row-local co-occurrence pair extraction over a ``toks`` array
    column (canonicalized src ≤ dst; self-pairs dropped later)."""
    w = int(window)
    return f"""
flatten(transform(sequence(1, size(toks) - 1), i ->
  transform(sequence(i + 1, least(i + {w}, size(toks))), j ->
    struct(least(element_at(toks, i), element_at(toks, j)) AS src,
           greatest(element_at(toks, i), element_at(toks, j)) AS dst))))
"""


def cooccurrence_edges(
    docs: DataFrame,
    window: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(src, dst) — the DISTINCT canonicalized co-occurrence pairs."""
    if window < 1:
        raise ValueError(f"window must be ≥ 1, got {window}")
    nrm = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            WS_CLASS + "+", " ",
        ),
        "^ | $", "",
    )
    toks = docs.select(F.split(nrm, " ").alias("toks")).filter(
        (F.size("toks") >= 2) & (F.col("toks") != F.array(F.lit("")))
    )
    pairs = toks.select(
        F.explode(F.expr(_pair_array_expr(window))).alias("p")
    ).select("p.src", "p.dst")
    return pairs.filter(F.col("src") != F.col("dst")).distinct()


def textrank_keywords(
    docs: DataFrame,
    window: int = 2,
    damping: float = 0.85,
    iters: int = 6,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """(pos, word, score) — the top-``k`` TextRank keywords; see the
    module docstring for the pinned definitions."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    # checkpointed: BOTH direction branches of the union consume the
    # pair table — uncached each re-runs the corpus tokenize + pair
    # explode + distinct (the table itself is vocabulary-bounded)
    e = cooccurrence_edges(docs, window=window, text_col=text_col
                           ).localCheckpoint(eager=True)
    both = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    scores = pagerank(both, damping=damping, iters=iters)
    top = (
        scores.select(
            F.col("node").alias("word"),
            F.round("rank", 8).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("word"))
        .limit(int(k))
    )
    win = Window.orderBy(F.col("score").desc(), F.col("word"))
    return top.select(
        F.row_number().over(win).alias("pos"), "word", "score"
    )


def textrank_oracle_sql(
    docs_sql: str,
    window: int = 2,
    damping: float = 0.85,
    iters: int = 6,
    k: int = 50,
) -> str:
    """The identical pinned pipeline in DuckDB over ``docs_sql`` (a
    SELECT yielding a ``text`` column): list-lambda pair extraction
    feeding the SAME generated unrolled-CTE PageRank twin (T32's
    ``pagerank_oracle_sql``), wrapped with the top-k order."""
    w = int(window)
    edges_cte = f"""
SELECT src, dst FROM (
  SELECT p.src AS src, p.dst AS dst FROM (
    SELECT unnest(flatten(list_transform(range(1, len(toks)), i ->
      list_transform(range(i + 1, least(i + {w}, len(toks)) + 1), j ->
        struct_pack(src := least(toks[i], toks[j]),
                    dst := greatest(toks[i], toks[j])))))) AS p
    FROM (
      SELECT string_split(
               trim(regexp_replace(lower(coalesce(text, '')),
                                   '{WS_CLASS}+', ' ', 'g')), ' ') AS toks
      FROM ({docs_sql})
    ) WHERE len(toks) >= 2 AND toks <> ['']
  )
) WHERE src <> dst
UNION
SELECT dst AS src, src AS dst FROM (
  SELECT p.src AS src, p.dst AS dst FROM (
    SELECT unnest(flatten(list_transform(range(1, len(toks)), i ->
      list_transform(range(i + 1, least(i + {w}, len(toks)) + 1), j ->
        struct_pack(src := least(toks[i], toks[j]),
                    dst := greatest(toks[i], toks[j])))))) AS p
    FROM (
      SELECT string_split(
               trim(regexp_replace(lower(coalesce(text, '')),
                                   '{WS_CLASS}+', ' ', 'g')), ' ') AS toks
      FROM ({docs_sql})
    ) WHERE len(toks) >= 2 AND toks <> ['']
  )
) WHERE src <> dst
"""
    pr = pagerank_oracle_sql(edges_cte, damping=damping, iters=iters)
    return f"""
SELECT row_number() OVER (ORDER BY score DESC, word) AS pos, word, score
FROM (
  SELECT node AS word, rank AS score FROM ({pr})
  ORDER BY score DESC, word LIMIT {int(k)}
)
"""

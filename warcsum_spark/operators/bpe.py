"""Distributed BPE merge learning (tokenizer training over the corpus).

Byte-pair-encoding subword learning exactly as Sennrich, Haddow & Birch
ACL 2016 define it (learn_bpe.py in the public subword-nmt repo — the
algorithm, not the code): a word is its character sequence with '</w>'
glued to the final character; each round counts adjacent symbol pairs
across the corpus weighted by word frequency (overlapping occurrences
both count), merges the most frequent pair everywhere (greedy
left-to-right within a word), and stops after ``n_merges`` rounds or
when the best pair drops below ``min_count`` (Sennrich's
min_frequency=2 default). Tie-break is deterministic here: highest
count, then lexicographically smallest (left, right) — Sennrich's
reference inherits dict order, which is not reproducible.

Why this decomposes well on Spark — the corpus is read ONCE:

1. word-type table: explode + groupBy(word) — the only corpus-sized
   exchange; everything after runs on the type table, which is orders
   of magnitude smaller (Heaps' law: ~10⁸ types for a 10¹²-token
   corpus, vs the corpus itself);
2. per round: pair counts = one slim ((left,right), partial-sum)
   exchange with map-side combine over the type table; the argmax is a
   LIMIT 1 collect of a single row (the same bounded-driver-scalar
   stance as IVF training, similarity.py);
3. merge application is ROW-LOCAL and pure JVM: an ``F.aggregate``
   fold threading (emitted-prefix, pending-symbol) state through the
   symbol array implements the greedy left-to-right merge — no Python
   anywhere in the loop; rows not containing the pair skip the fold via
   an ``exists`` guard;
4. each round ends in ``localCheckpoint`` to cut the per-round lineage
   (the clusters.py iterative precedent; the production seam for
   resumable training is the same StateStore used by the frontier).

``encode_words`` applies a LEARNED merge table to word types with an
Arrow kernel (the merge list is dimension-sized and broadcast by
value): applying 30k merges is a per-word trie/loop, which no fixed
JVM expression tree expresses — the kernel is batched, never per-row
Python in the banned sense.

Reference mapping: the reference engine has no tokenizer; this is part
of the §2.12 training-data surface (SURVEY §2.12, T51).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"


def _word_symbols(word):
    """Column expr: character symbols of a word, '</w>' glued to the
    final character (1-char words become a single 'c</w>' symbol)."""
    n = F.length(word)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i == n, F.concat(F.substring(word, -1, 1), F.lit(END))
        ).otherwise(F.substring(word, i, 1)),
    )


def _adjacent_pairs(syms):
    """Column expr: all adjacent (left, right) symbol pairs, overlapping
    occurrences included (Sennrich's get_stats counts both in 'aaa')."""
    m = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, m),
        F.slice(syms, 2, m),
        lambda x, y: F.struct(x.alias("left"), y.alias("right")),
    )


def _merge_fold(syms, left: str, right: str):
    """Column expr: greedy left-to-right merge of every (left, right)
    adjacency into left||right — a pure-JVM F.aggregate fold carrying
    (out-array, pending-symbol) state. 'aaa' + (a,a) → ['aa','a']."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        pend, out = acc["pend"], acc["out"]
        hit = pend.eqNullSafe(F.lit(left)) & (s == F.lit(right))
        new_out = F.when(pend.isNull(), out).otherwise(
            F.when(hit, F.concat(out, F.array(F.lit(merged)))).otherwise(
                F.concat(out, F.array(pend))
            )
        )
        new_pend = F.when(
            pend.isNotNull() & hit, F.lit(None).cast("string")
        ).otherwise(s)
        return F.struct(new_out.alias("out"), new_pend.alias("pend"))

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def word_type_table(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, count, syms) — the corpus collapsed to word types. The
    one corpus-sized exchange in BPE learning."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (
        docs.select(F.explode(F.split(F.trim(txt), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    return words.withColumn("syms", _word_symbols(F.col("word")))


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 25,
    min_count: int = 2,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Learn the BPE merge table: (rank, left, right, pair_count), rank
    1-based in merge order. Stops early when the best pair's corpus
    count falls below min_count."""
    spark = docs.sparkSession
    # Eager localCheckpoint: truncates the logical plan each round, so
    # driver-side analysis of the (large) fold expression stays
    # constant per round instead of compounding. Measured alternatives
    # at sf0.1/local[32]: lazy checkpoints (no change — the cost is
    # per-round fixed overhead, not job count) and coalescing the type
    # table to 1 partition (worse — it serializes the fold's real
    # compute). The ~0.55 s/round floor amortizes exactly like the
    # frontier superstep: per-round work grows with corpus size while
    # the overhead stays fixed.
    types = word_type_table(docs, text_col, lowercase).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            types.select(F.col("count"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("count").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < min_count:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].pair_count)
        merges.append((rank, left, right, cnt))
        has_pair = F.exists(
            _adjacent_pairs(F.col("syms")),
            lambda p: (p["left"] == F.lit(left)) & (p["right"] == F.lit(right)),
        )
        types = types.withColumn(
            "syms",
            F.when(has_pair, _merge_fold(F.col("syms"), left, right)).otherwise(
                F.col("syms")
            ),
        ).localCheckpoint()

    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("left", T.StringType(), False),
            T.StructField("right", T.StringType(), False),
            T.StructField("pair_count", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(merges, schema)


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """T87 — tokenize the corpus with a TRAINED merge table: per doc
    (id, n_words, n_tokens, n_distinct_subwords). The other half of
    T51: learn_bpe produces the merge table, this applies it — the
    token-budget / sequence-packing inputs (T4/T76) a training pipeline
    actually consumes.

    Scale shape (Sennrich's dictionary trick, also how SentencePiece
    encodes at corpus scale): encode DISTINCT word types once — the
    type table is Heaps'-law small relative to the corpus — then hash-
    join the encodings back to the word stream. One corpus-sized
    exchange for the word explode + one join; the merge loop itself
    never touches corpus-sized data. The Arrow kernel (encode_words)
    is the engine path; for a WELL-FORMED merge table — every side of
    a merge is a single symbol or the output of an EARLIER merge,
    which any table produced by learn_bpe satisfies by construction —
    its lowest-rank-first loop is equivalent to replaying merges once
    each in rank order, greedy left-to-right, and the generated DuckDB
    twin (bpe_encode_sql) replays exactly that. Docs with no words
    come back with zero counts."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.trim(txt), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    # cached: three branches (type-table distinct, the encode join, the
    # per-doc word count) consume the word stream — uncached each
    # re-runs the corpus tokenize+explode
    words = words.cache()
    enc = encode_words(words.select("word").distinct(), merges)
    toks = words.join(enc, "word").select(
        id_col, F.explode("subwords").alias("sub")
    )
    stats = toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("sub").alias("n_distinct_subwords"),
    )
    wc = words.groupBy(id_col).agg(F.count("*").alias("n_words"))
    return (
        docs.select(id_col)
        .distinct()
        .join(wc, id_col, "left")
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_distinct_subwords", F.lit(0))
            .cast("long")
            .alias("n_distinct_subwords"),
        )
    )


def bpe_encode_sql(
    source_cte: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> str:
    """The identical encode as DuckDB SQL for the driver gate —
    generated beside the implementation so the two cannot drift.
    ``source_cte`` must define ``src(<id_col>, text)``. Each merge is
    one greedy left-to-right pass over the space-separated symbol
    string, in rank order (exact for well-formed tables, see
    encode_corpus). Non-overlap under left==right merges is handled by
    the doubled-separator trick: double every space, replace the
    doubled-interior pattern, then collapse — adjacent occurrences no
    longer share a boundary space."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    txt = "lower(trim(text))" if lowercase else "trim(text)"
    # char symbols with '</w>' glued to the final char: 'abc' -> 'a b c</w>'
    expr = (
        "regexp_replace(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), "
        "'([^ ]+)$', '\\1</w>')"
    )
    for left, right in merges:
        pat = q(f" {left}  {right} ")
        rep = q(f" {left}{right} ")
        expr = (
            f"trim(replace(replace(replace(' ' || {expr} || ' ', "
            f"' ', '  '), '{pat}', '{rep}'), '  ', ' '))"
        )
    return f"""
WITH {source_cte},
words AS (
  SELECT {id_col}, w FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array({txt}, '\\s+')) AS w
    FROM src)
  WHERE w <> ''
), types AS (
  SELECT DISTINCT w FROM words
), enc AS (
  SELECT w, {expr} AS s FROM types
), toks AS (
  SELECT {id_col}, unnest(string_split(e.s, ' ')) AS sub
  FROM words JOIN enc e USING (w)
), stats AS (
  SELECT {id_col}, count(*) AS n_tokens,
         count(DISTINCT sub) AS n_distinct_subwords
  FROM toks GROUP BY {id_col}
), wc AS (
  SELECT {id_col}, count(*) AS n_words FROM words GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(wc.n_words, 0)::BIGINT AS n_words,
       coalesce(stats.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(stats.n_distinct_subwords, 0)::BIGINT
         AS n_distinct_subwords
FROM (SELECT DISTINCT {id_col} FROM src) d
LEFT JOIN wc USING ({id_col})
LEFT JOIN stats USING ({id_col})
"""


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list to word types: adds a ``subwords``
    array<string> column. Arrow-batched kernel; the merge list is
    dimension-sized (|vocab| merges) and ships by closure broadcast.
    Merges apply in rank order, each greedy left-to-right — identical
    semantics to replaying `_merge_fold` per rank, which pytest pins."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(col: pd.Series) -> pd.Series:
        def one(w):
            if w is None:
                return None
            syms = [*w[:-1], w[-1] + END] if w else []
            # standard encoder: repeatedly merge the lowest-rank
            # adjacent pair present (equivalent to replaying merges in
            # rank order; pinned against the fold in tests)
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                l, r_ = merges[best]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r_:
                        out.append(l + r_)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(one)

    # §4.4 fence: the subword explode's inferred size()>0 predicate
    # otherwise re-runs the merge replay below the type-table join
    return words.withColumn(
        "subwords", seg.asNondeterministic()(F.col(word_col))
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lowercase: bool = True,
) -> DataFrame:
    """T110 — per-language tokenizer fertility and compression (Rust,
    Pfeiffer, Vulić, Ruder & Gurevych, ACL 2021, "How Good is Your
    Tokenizer?" — fertility = subword tokens per word, THE standard
    diagnostic for how well a tokenizer's merge table serves each
    language; Scao et al. 2022 (BLOOM) report the byte-level variant
    as bytes/token). A multilingual pretraining recipe reads this
    table before fixing the tokenizer: a language with fertility 2×
    another's pays 2× the context window for the same text, and
    UniMax/temperature mixing (T104/T20) budgets in TOKENS, so the
    fertility table converts their document budgets into real cost.

    Per language: (lang, n_docs, n_words, n_tokens, fertility,
    bytes_per_token, chars_per_token) where bytes/chars count the RAW
    text column (whitespace included — the storage-cost view; the
    word-level view is fertility itself). Sums are exact
    DECIMAL(38,0) accumulations of per-doc integers; each metric is
    ONE pinned division rounded to 6; zero-word languages yield NULL
    metrics (no claim, the T96 discipline).

    Plan shape: rides encode_corpus verbatim (distinct word types
    encoded once by the Arrow kernel, hash-joined back — the corpus
    exchange count does not grow), then one lang-keyed map-side-
    combinable aggregate over per-doc slim rows. Text bytes never
    shuffle; the output is dimension-sized (one row per language).
    """
    enc = encode_corpus(
        docs, merges, text_col=text_col, id_col=id_col, lowercase=lowercase
    )
    sizes = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.octet_length(text_col).cast("long").alias("_bytes"),
        F.length(text_col).cast("long").alias("_chars"),
    )
    dec = "decimal(38,0)"
    agg = (
        sizes.join(enc, id_col)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_words").cast(dec)).alias("s_w"),
            F.sum(F.col("n_tokens").cast(dec)).alias("s_t"),
            F.sum(F.col("_bytes").cast(dec)).alias("s_b"),
            F.sum(F.col("_chars").cast(dec)).alias("s_c"),
        )
    )
    def _ratio(num, den):
        return F.when(
            F.col(den) > 0,
            F.round(
                F.col(num).cast("double") / F.col(den).cast("double"), 6
            ),
        )

    return agg.select(
        "lang",
        "n_docs",
        F.col("s_w").cast("long").alias("n_words"),
        F.col("s_t").cast("long").alias("n_tokens"),
        _ratio("s_t", "s_w").alias("fertility"),
        _ratio("s_b", "s_t").alias("bytes_per_token"),
        _ratio("s_c", "s_t").alias("chars_per_token"),
    )


def tokenizer_fertility_sql(
    source_cte: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lowercase: bool = True,
) -> str:
    """The IDENTICAL pinned metrics for DuckDB, composed over
    bpe_encode_sql (same merge replay, same encode). ``source_cte``
    must define ``src(<id_col>, text, <lang_col>)``."""
    enc = bpe_encode_sql(source_cte, merges, id_col=id_col,
                         lowercase=lowercase)
    return f"""
WITH enc AS MATERIALIZED ({enc}),
{source_cte},
sizes AS (
  SELECT {id_col}, {lang_col} AS lang,
         -- strlen = UTF-8 bytes in DuckDB (octet_length is BLOB-only);
         -- matches Spark's octet_length(VARCHAR)
         CAST(strlen(text) AS HUGEINT) AS b,
         CAST(length(text) AS HUGEINT) AS c
  FROM src
), agg AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         sum(CAST(n_words AS HUGEINT)) AS s_w,
         sum(CAST(n_tokens AS HUGEINT)) AS s_t,
         sum(b) AS s_b,
         sum(c) AS s_c
  FROM sizes JOIN enc USING ({id_col})
  GROUP BY lang
)
SELECT lang, n_docs,
  CAST(s_w AS BIGINT) AS n_words,
  CAST(s_t AS BIGINT) AS n_tokens,
  CASE WHEN s_w > 0
       THEN round(CAST(s_t AS DOUBLE) / CAST(s_w AS DOUBLE), 6)
  END AS fertility,
  CASE WHEN s_t > 0
       THEN round(CAST(s_b AS DOUBLE) / CAST(s_t AS DOUBLE), 6)
  END AS bytes_per_token,
  CASE WHEN s_t > 0
       THEN round(CAST(s_c AS DOUBLE) / CAST(s_t AS DOUBLE), 6)
  END AS chars_per_token
FROM agg
"""

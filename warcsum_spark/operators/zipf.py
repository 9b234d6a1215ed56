"""T90 — corpus-law diagnostics: Zipf rank-frequency slope and Heaps'
vocabulary-growth fit.

Why a crawl/training-data engine wants these: healthy natural-language
corpora obey Zipf's law (rank-frequency slope ≈ −1, Zipf 1949) and
Heaps' law (vocabulary V ≈ K·N^β with β ≈ 0.4–0.6, Heaps 1978); large
deviations are the classic whole-corpus smoke alarms — template/
boilerplate floods flatten the Zipf head, machine-generated or
deduplicated-to-death text bends the slope, OCR noise and encoding
mojibake inflate Heaps β toward 1 (every error mints a new "word").
Corpus datasheets report both; a pipeline wants them per snapshot to
diff crawls (T56) and to sanity-gate mixture inputs (T20) — one cheap
row per corpus, not a research fit.

Pinned, engine-portable definitions:

* tokens: whitespace-normalized lowercase words — the WS_CLASS
  contract shared with PMI/TF-IDF/BM25/top-ngrams (quality.py::_norm);
* Zipf sample: the top ``max_rank`` vocabulary entries by
  ``(count DESC, word ASC)`` — the deterministic total order — with
  rank 1..max_rank; fit ``ln(count) = intercept + slope·ln(rank)`` by
  ordinary least squares;
* Heaps sample: one point per document — ``x = ln(n_tokens)``,
  ``y = ln(n_distinct_tokens)`` (both row-local: array size /
  array_distinct size; wordless docs excluded); fit
  ``ln V = ln K + β·ln N``; ``heaps_k = exp(intercept)``;
* both fits report slope, intercept-derived constant, and r²,
  rounded to 6; degenerate samples (< 2 points or zero x-variance)
  report NULLs.

Float discipline (the lm_score.py lesson, taken one step further
because REGRESSION needs cross-row sums and distributed float addition
is order-dependent): each per-point ``ln`` is scaled by 1e8 and
rounded to an exact integer, and the five regression sums (Σx, Σy,
Σxy, Σx², Σy²) are accumulated in DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) — exact, overflow-safe to ~1e38, and ASSOCIATIVE, so any
partitioning order yields the identical integers. The closed-form OLS
expressions then perform a fixed, pinned sequence of IEEE ops on those
integers, so both engines emit bit-identical doubles (up to the
accepted last-ulp ``ln``/``exp`` libm caveat that the repo's pinned
expressions already carry).

Plan shape at 100 TB:

1. ONE corpus pass: per-doc word arrays give the Heaps point row-
   locally (size / array_distinct — zero exchange), and the exploded
   words feed the single corpus-grain ``groupBy(word)`` exchange
   (map-side combinable; Zipfian keys collapse before the shuffle);
2. the Zipf head is a distributed ``TakeOrderedAndProject`` top-k
   (the top_ngrams precedent) — max_rank rows, dimension-sized, so the
   rank window runs on one tiny partition by construction;
3. both fits are scalar aggregates; the final one-row join is the
   tfidf.py one-row-broadcast pattern. No global sort, no collect, no
   Python anywhere.

No reference counterpart (warcsum has no corpus statistics); the laws
and the OLS algebra are textbook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import WS_CLASS

#: ln values are scaled by this and rounded to exact integers before
#: the cross-row sums — associativity is what buys cross-engine parity
SCALE = 100_000_000  # 1e8

_DEC = "decimal(38,0)"


def _norm(text: Column) -> Column:
    s = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), WS_CLASS + "+", " ")
    return F.regexp_replace(s, "^ | $", "")


def _scaled_ln(c: Column) -> Column:
    """round(ln(c)·1e8) as an exact integer column."""
    return F.round(F.log(c.cast("double")) * F.lit(SCALE)).cast("long")


def _ols(prefix: str) -> dict[str, Column]:
    """slope / intercept / r² (unrounded) + the validity predicate,
    from the five exact DECIMAL sums named ``{prefix}_{n,sx,sy,sxy,
    sxx,syy}`` — the pinned closed form. The scale factor cancels in
    slope and r²; the intercept needs one un-scaling."""
    n = F.col(f"{prefix}_n").cast(_DEC)
    sx = F.col(f"{prefix}_sx")
    sy = F.col(f"{prefix}_sy")
    sxy = F.col(f"{prefix}_sxy")
    sxx = F.col(f"{prefix}_sxx")
    syy = F.col(f"{prefix}_syy")
    vx = (n * sxx) - (sx * sx)
    vy = (n * syy) - (sy * sy)
    cov = (n * sxy) - (sx * sy)
    ok = (F.col(f"{prefix}_n") >= 2) & (vx != 0)
    slope = cov.cast("double") / vx.cast("double")
    # intercept in SCALED y units: (Σy − slope·Σx)/n ; un-scale by 1e8
    intercept = (
        (sy.cast("double") - (slope * sx.cast("double")))
        / n.cast("double")
    ) / F.lit(float(SCALE))
    r2 = F.when(
        vy != 0,
        (cov.cast("double") * cov.cast("double"))
        / (vx.cast("double") * vy.cast("double")),
    )
    return {"ok": ok, "slope": slope, "intercept": intercept, "r2": r2}


def _sums(x: Column, y: Column, prefix: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias(f"{prefix}_n"),
        F.sum(x.cast(_DEC)).alias(f"{prefix}_sx"),
        F.sum(y.cast(_DEC)).alias(f"{prefix}_sy"),
        F.sum((x.cast(_DEC) * y.cast(_DEC))).alias(f"{prefix}_sxy"),
        F.sum((x.cast(_DEC) * x.cast(_DEC))).alias(f"{prefix}_sxx"),
        F.sum((y.cast(_DEC) * y.cast(_DEC))).alias(f"{prefix}_syy"),
    ]


def corpus_laws(
    docs: DataFrame,
    text_col: str = "text",
    max_rank: int = 1000,
) -> DataFrame:
    """ONE row: (n_docs, n_tokens, n_vocab, zipf_slope, zipf_intercept,
    zipf_r2, heaps_beta, heaps_k, heaps_r2). See module docstring for
    the pinned definitions and the exact-integer-sum float discipline."""
    staged = docs.select(_norm(F.col(text_col)).alias("nrm")).filter(
        F.col("nrm") != ""
    )
    words = staged.select(F.split(F.col("nrm"), " ").alias("ws"))
    # lineage fork: word arrays feed BOTH the Heaps points and the vocab
    # explode — localCheckpoint (lazy) cuts the re-normalization re-read
    # (the collocations.py precedent)
    words = words.localCheckpoint(eager=False)

    # Heaps: one row-local point per doc, then exact sums
    hx = _scaled_ln(F.size(F.col("ws")))
    hy = _scaled_ln(F.size(F.array_distinct(F.col("ws"))))
    heaps = words.select(hx.alias("x"), hy.alias("y")).agg(
        *_sums(F.col("x"), F.col("y"), "heaps")
    )

    # vocabulary counts: the single corpus-grain exchange
    vocab = (
        words.select(F.explode(F.col("ws")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = vocab.localCheckpoint(eager=False)  # head + totals share it
    totals = vocab.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    head = (
        vocab.orderBy(F.col("c").desc(), F.col("w"))  # TakeOrdered top-k
        .limit(max_rank)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("w")))
            .alias("rank"),
            F.col("c"),
        )
    )
    zipf = head.select(
        _scaled_ln(F.col("rank")).alias("x"), _scaled_ln(F.col("c")).alias("y")
    ).agg(*_sums(F.col("x"), F.col("y"), "zipf"))

    n_docs = words.agg(F.count(F.lit(1)).alias("n_docs"))

    row = (
        n_docs.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(zipf))
        .crossJoin(F.broadcast(heaps))
    )
    z = _ols("zipf")
    h = _ols("heaps")
    # heaps_k = exp(intercept); β is the slope, per the law's naming
    return row.select(
        "n_docs",
        "n_tokens",
        "n_vocab",
        F.when(z["ok"], F.round(z["slope"], 6)).alias("zipf_slope"),
        F.when(z["ok"], F.round(z["intercept"], 6)).alias("zipf_intercept"),
        F.when(z["ok"], F.round(z["r2"], 6)).alias("zipf_r2"),
        F.when(h["ok"], F.round(h["slope"], 6)).alias("heaps_beta"),
        F.when(h["ok"], F.round(F.exp(h["intercept"]), 6)).alias("heaps_k"),
        F.when(h["ok"], F.round(h["r2"], 6)).alias("heaps_r2"),
    )


def corpus_laws_sql(
    docs_table: str = "documents",
    text_col: str = "text",
    max_rank: int = 1000,
) -> str:
    """The IDENTICAL pinned arithmetic for DuckDB — HUGEINT sums over
    the same 1e8-scaled integer ln points, the same closed forms."""
    norm = (
        f"trim(regexp_replace(lower(coalesce({text_col}, '')),"
        f" '{WS_CLASS}+', ' ', 'g'))"
    )
    sl = "CAST(round(ln(CAST({v} AS DOUBLE)) * 100000000) AS BIGINT)"

    def sums(xe: str, ye: str, p: str) -> str:
        return (
            f"count(*) AS {p}_n, "
            f"sum(CAST({xe} AS HUGEINT)) AS {p}_sx, "
            f"sum(CAST({ye} AS HUGEINT)) AS {p}_sy, "
            f"sum(CAST({xe} AS HUGEINT) * CAST({ye} AS HUGEINT)) AS {p}_sxy, "
            f"sum(CAST({xe} AS HUGEINT) * CAST({xe} AS HUGEINT)) AS {p}_sxx, "
            f"sum(CAST({ye} AS HUGEINT) * CAST({ye} AS HUGEINT)) AS {p}_syy"
        )

    def ols(p: str) -> dict[str, str]:
        n = f"CAST({p}_n AS HUGEINT)"
        vx = f"(({n} * {p}_sxx) - ({p}_sx * {p}_sx))"
        vy = f"(({n} * {p}_syy) - ({p}_sy * {p}_sy))"
        cov = f"(({n} * {p}_sxy) - ({p}_sx * {p}_sy))"
        ok = f"({p}_n >= 2 AND {vx} <> 0)"
        slope = f"(CAST({cov} AS DOUBLE) / CAST({vx} AS DOUBLE))"
        intercept = (
            f"(((CAST({p}_sy AS DOUBLE) - ({slope} * CAST({p}_sx AS DOUBLE)))"
            f" / CAST({n} AS DOUBLE)) / 100000000.0)"
        )
        r2 = (
            f"CASE WHEN {vy} <> 0 THEN"
            f" ((CAST({cov} AS DOUBLE) * CAST({cov} AS DOUBLE))"
            f" / (CAST({vx} AS DOUBLE) * CAST({vy} AS DOUBLE))) END"
        )
        return {
            "slope": f"CASE WHEN {ok} THEN round({slope}, 6) END",
            "intercept": f"CASE WHEN {ok} THEN round({intercept}, 6) END",
            "k": f"CASE WHEN {ok} THEN round(exp({intercept}), 6) END",
            "r2": f"CASE WHEN {ok} THEN round({r2}, 6) END",
        }

    z = ols("zipf")
    h = ols("heaps")
    return f"""
WITH staged AS (
  SELECT {norm} AS nrm FROM {docs_table}
), ws AS (
  SELECT string_split(nrm, ' ') AS ws FROM staged WHERE nrm <> ''
), heaps_pts AS (
  SELECT {sl.format(v='len(ws)')} AS x,
         {sl.format(v='len(list_distinct(ws))')} AS y
  FROM ws
), heaps_s AS (
  SELECT {sums('x', 'y', 'heaps')} FROM heaps_pts
), vocab AS (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w
), totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*)::BIGINT AS n_vocab
  FROM vocab
), head AS (
  SELECT row_number() OVER (ORDER BY c DESC, w) AS rank, c
  FROM vocab ORDER BY c DESC, w LIMIT {max_rank}
), zipf_pts AS (
  SELECT {sl.format(v='rank')} AS x, {sl.format(v='c')} AS y FROM head
), zipf_s AS (
  SELECT {sums('x', 'y', 'zipf')} FROM zipf_pts
), nd AS (
  SELECT count(*)::BIGINT AS n_docs FROM ws
)
SELECT n_docs, n_tokens, n_vocab,
  {z['slope']} AS zipf_slope,
  {z['intercept']} AS zipf_intercept,
  {z['r2']} AS zipf_r2,
  {h['slope']} AS heaps_beta,
  {h['k']} AS heaps_k,
  {h['r2']} AS heaps_r2
FROM nd CROSS JOIN totals CROSS JOIN zipf_s CROSS JOIN heaps_s
"""

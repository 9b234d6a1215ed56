"""T125 — Simple Good-Turing frequency smoothing (Good, Biometrika
1953 for the Turing estimator; Gale & Sampson, Journal of
Quantitative Linguistics 2(3) 1995 for the "Simple" smoothing that
made it practical). The corpus-statistics question every LM data
pipeline eventually asks: how much probability mass belongs to the
words we have NOT seen (p0 = N1/N — the vocabulary-growth forecast
that prices tokenizer OOV rates and dedup-vs-diversity tradeoffs),
and what is the ADJUSTED count r* for a word seen r times (raw ML
estimates overfit exactly the Zipf tail T90 measures)? SGT is the
standard answer reported in corpus datasheets and used as the
baseline smoother KN-style LMs (T39/knlm) are compared against.

Pinned, engine-portable definitions (the zipf.py / bursts.py float
discipline):

* words: the shared WS_CLASS tokenizer contract; counts r ≥ 1 per
  distinct word; frequency-of-frequencies N_r over observed r;
* Z_r = 2·N_r/(t − q) with q/t the previous/next OBSERVED r
  (q = 0 for the first, t = 2r − q for the last — Gale & Sampson's
  neighbor averaging);
* the smoothing line ln Z = a + b·ln r is fitted by OLS over
  1e8-scaled integer ln points summed in DECIMAL(38,0)/HUGEINT —
  exact and associative, so any partitioning yields identical sums
  (the T90 regression discipline); b is round-9 QUANTIZED before use;
* r*_LGT = r·((r+1)/r)^(b+1), computed as
  exp((b9+1)·ln9((r+1)/r)) with the ln quantized round-9 BEFORE the
  multiply and the exp result quantized round-9 (the bursts.py libm
  rule; IEEE divisions and sqrt are correctly rounded and need no
  guard);
* r*_T = (r+1)·N_{r+1}/N_r, defined only when r+1 is observed;
* switch rule: ascending r, use Turing until the FIRST r where
  either N_{r+1} is unobserved or
  |r*_T − r*_LGT| ≤ 1.65·sqrt((r+1)²·(N_{r+1}/N_r²)·(1+N_{r+1}/N_r));
  from that r on (switch_r = the min flagged r), every row uses LGT
  — "once you switch you never go back" without a sequential scan;
* p0 = N_1/N (0.0 when N_1 unobserved); per-word probability for a
  count-r word: p_word = (1−p0)·r*/Σ_r(N_r·r*) with the normalizer
  accumulated EXACTLY: r* is already round-9, so N_r·round(r*·1e9)
  is an exact integer summed in DECIMAL(38,0) — associative again;
* degenerate fits (< 2 distinct r, or zero ln-r variance) emit NULL
  r_star/method/p_word (p0 and the raw table still reported);
  outputs rounded: z_r/r_star to 6, p0/p_word to 8.

Plan shape at 100 TB: ONE corpus-grain exchange (groupBy word,
map-side combinable — Zipfian keys collapse before the shuffle),
one vocab-grain exchange to the frequency-of-frequencies table,
and everything after runs on the DIMENSION-sized (r, N_r) table
(~hundreds of rows at any corpus size — max r grows, not the row
count): its global order window and one-row broadcast joins are the
established small-table discipline (T90/tfidf). Text never shuffles.

No reference counterpart (warcsum has no corpus statistics); the
estimator and smoothing are textbook, cited above. §2.12 corpus-law
family, sibling of T90/T39/T47.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import WS_CLASS
from warcsum_spark.operators.zipf import SCALE, _ols, _scaled_ln, _sums

_DEC = "decimal(38,0)"
#: round-9 quantizer applied to libm outputs (ln/exp) before reuse —
#: confines SIMD-vs-scalar ulp drift to a measure-zero boundary
_Q = 9


def _q9(c: Column) -> Column:
    return F.round(c, _Q)


def good_turing(
    docs: DataFrame,
    text_col: str = "text",
    confidence: float = 1.65,
) -> DataFrame:
    """One row per observed count r: (r, n_r, z_r, r_star, method,
    p0, p_word). See the module docstring for the pinned definitions."""
    if confidence <= 0:
        raise ValueError(f"confidence must be > 0, got {confidence}")
    nrm = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            WS_CLASS + "+", " ",
        ),
        "^ | $", "",
    )
    words = (
        docs.select(F.split(nrm, " ").alias("ws"))
        .select(F.explode("ws").alias("w"))
        .filter(F.col("w") != "")
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    ff = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))

    # dimension-sized from here on: neighbor ranks + Z_r. N_{r+1} is
    # only the lead value when the next OBSERVED rank is exactly r+1 —
    # a gap leaves Turing undefined (Gale & Sampson's switch trigger)
    win = Window.orderBy("r")
    ff = ff.select(
        "r",
        "n_r",
        F.coalesce(F.lag("r").over(win), F.lit(0)).alias("q"),
        F.lead("r").over(win).alias("r_next"),
        F.lead("n_r").over(win).alias("n_next"),
    ).select(
        "r",
        "n_r",
        "q",
        F.coalesce(
            F.col("r_next"), F.lit(2) * F.col("r") - F.col("q")
        ).alias("t"),
        F.when(
            F.col("r_next") == F.col("r") + 1, F.col("n_next")
        ).alias("n_r1"),
    )
    z = (
        F.lit(2.0)
        * F.col("n_r").cast("double")
        / (F.col("t") - F.col("q")).cast("double")
    )
    ff = ff.select("r", "n_r", "n_r1", z.alias("z_r"))
    ff = ff.localCheckpoint(eager=False)  # fit + totals + rows share it

    fit = ff.select(
        _scaled_ln(F.col("r")).alias("x"),
        _scaled_ln(F.col("z_r")).alias("y"),
    ).agg(*_sums(F.col("x"), F.col("y"), "sgt"))
    totals = ff.agg(
        F.sum(F.col("r").cast(_DEC) * F.col("n_r").cast(_DEC)).alias("big_n"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r"))).alias("n1"),
    )

    o = _ols("sgt")
    line = fit.select(
        F.when(o["ok"], _q9(o["slope"])).alias("b9"),
    )
    staged = (
        ff.crossJoin(F.broadcast(line))
        .crossJoin(F.broadcast(totals))
    )

    r_d = F.col("r").cast("double")
    # LGT: exp((b9+1)·ln9((r+1)/r)), quantized at each libm hop
    lgt = _q9(
        r_d
        * _q9(
            F.exp(
                _q9((F.col("b9") + F.lit(1.0)) * _q9(F.log((r_d + 1) / r_d)))
            )
        )
    )
    turing = F.when(
        F.col("n_r1").isNotNull(),
        (r_d + 1) * F.col("n_r1").cast("double") / F.col("n_r").cast("double"),
    )
    ratio = F.col("n_r1").cast("double") / F.col("n_r").cast("double")
    thr = F.lit(float(confidence)) * F.sqrt(
        (r_d + 1)
        * (r_d + 1)
        * (ratio / F.col("n_r").cast("double"))
        * (F.lit(1.0) + ratio)
    )
    flagged = F.col("n_r1").isNull() | (F.abs(turing - lgt) <= thr)
    staged = staged.select(
        "r", "n_r", "z_r", "b9", "big_n", "n1",
        lgt.alias("lgt"),
        turing.alias("turing"),
        flagged.alias("flagged"),
    )
    # switch_r = min flagged r; Turing strictly below it, LGT at/after
    sw = staged.agg(
        F.min(F.when(F.col("flagged"), F.col("r"))).alias("switch_r")
    )
    staged = staged.crossJoin(F.broadcast(sw))
    use_t = F.col("switch_r").isNotNull() & (F.col("r") < F.col("switch_r"))
    r_star = F.when(F.col("b9").isNotNull(),
                    F.when(use_t, _q9(F.col("turing"))).otherwise(F.col("lgt")))
    staged = staged.select(
        "r", "n_r", "z_r", "b9", "big_n", "n1",
        F.when(F.col("b9").isNotNull(),
               F.when(use_t, F.lit("T")).otherwise(F.lit("LGT")))
        .alias("method"),
        r_star.alias("r_star"),
    )
    staged = staged.localCheckpoint(eager=False)  # normalizer + rows
    # exact normalizer: N_r · round(r*·1e9) summed in DECIMAL(38,0)
    norm = staged.agg(
        F.sum(
            F.col("n_r").cast(_DEC)
            * F.round(F.col("r_star") * F.lit(1e9)).cast(_DEC)
        ).alias("norm9")
    )
    out = staged.crossJoin(F.broadcast(norm))
    p0 = F.when(
        F.col("n1").isNotNull(),
        F.col("n1").cast("double") / F.col("big_n").cast("double"),
    ).otherwise(F.lit(0.0))
    p_word = (
        (F.lit(1.0) - p0)
        * F.col("r_star")
        / (F.col("norm9").cast("double") / F.lit(1e9))
    )
    return out.select(
        "r",
        "n_r",
        F.round("z_r", 6).alias("z_r"),
        F.round("r_star", 6).alias("r_star"),
        "method",
        F.round(p0, 8).alias("p0"),
        F.round(p_word, 8).alias("p_word"),
    )


def good_turing_oracle_sql(
    docs_sql: str,
    confidence: float = 1.65,
) -> str:
    """The identical pinned arithmetic in DuckDB over ``docs_sql`` (a
    SELECT yielding a ``text`` column) — HUGEINT regression sums over
    the same 1e8-scaled ln points, the same round-9 libm quantization
    hops, the same exact 1e9-scaled normalizer."""
    conf = repr(float(confidence))
    sl = f"CAST(round(ln(CAST({{v}} AS DOUBLE)) * {SCALE}) AS BIGINT)"
    return f"""
WITH base AS ({docs_sql}),
words AS (
  SELECT w FROM (
    SELECT unnest(string_split(
      trim(regexp_replace(lower(coalesce(text, '')),
                          '{WS_CLASS}+', ' ', 'g')), ' ')) AS w
    FROM base
  ) WHERE w <> ''
),
counts AS (SELECT w, count(*)::BIGINT AS r FROM words GROUP BY w),
ff0 AS (SELECT r, count(*)::BIGINT AS n_r FROM counts GROUP BY r),
ff AS (
  SELECT r, n_r,
         2.0 * CAST(n_r AS DOUBLE)
           / CAST(coalesce(lead(r) OVER (ORDER BY r),
                           2 * r - coalesce(lag(r) OVER (ORDER BY r), 0))
                  - coalesce(lag(r) OVER (ORDER BY r), 0) AS DOUBLE)
           AS z_r,
         CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
              THEN lead(n_r) OVER (ORDER BY r) END AS n_r1
  FROM ff0
),
fit AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM (SELECT {sl.format(v='r')} AS x, {sl.format(v='z_r')} AS y FROM ff)
),
line AS (
  SELECT CASE WHEN n >= 2
               AND (CAST(n AS HUGEINT) * sxx - sx * sx) <> 0
          THEN round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 9)
          END AS b9
  FROM fit
),
totals AS (
  SELECT sum(CAST(r AS HUGEINT) * CAST(n_r AS HUGEINT)) AS big_n,
         sum(CASE WHEN r = 1 THEN n_r END)::BIGINT AS n1
  FROM ff
),
staged AS (
  SELECT ff.r, ff.n_r, ff.z_r, ff.n_r1, line.b9, totals.big_n, totals.n1,
         round(CAST(ff.r AS DOUBLE) * round(exp(round(
             (line.b9 + 1.0)
             * round(ln((CAST(ff.r AS DOUBLE) + 1) / CAST(ff.r AS DOUBLE)), 9),
           9)), 9), 9) AS lgt,
         CASE WHEN ff.n_r1 IS NOT NULL
              THEN (CAST(ff.r AS DOUBLE) + 1) * CAST(ff.n_r1 AS DOUBLE)
                   / CAST(ff.n_r AS DOUBLE) END AS turing,
         (ff.n_r1 IS NULL OR abs(
            (CAST(ff.r AS DOUBLE) + 1) * CAST(ff.n_r1 AS DOUBLE)
              / CAST(ff.n_r AS DOUBLE)
            - round(CAST(ff.r AS DOUBLE) * round(exp(round(
                (line.b9 + 1.0)
                * round(ln((CAST(ff.r AS DOUBLE) + 1)
                           / CAST(ff.r AS DOUBLE)), 9),
              9)), 9), 9)
          ) <= {conf} * sqrt(
            (CAST(ff.r AS DOUBLE) + 1) * (CAST(ff.r AS DOUBLE) + 1)
            * (CAST(ff.n_r1 AS DOUBLE) / CAST(ff.n_r AS DOUBLE)
               / CAST(ff.n_r AS DOUBLE))
            * (1.0 + CAST(ff.n_r1 AS DOUBLE) / CAST(ff.n_r AS DOUBLE))))
           AS flagged
  FROM ff CROSS JOIN line CROSS JOIN totals
),
sw AS (SELECT min(CASE WHEN flagged THEN r END) AS switch_r FROM staged),
starred AS (
  SELECT s.r, s.n_r, s.z_r, s.big_n, s.n1,
         CASE WHEN s.b9 IS NOT NULL THEN
           CASE WHEN sw.switch_r IS NOT NULL AND s.r < sw.switch_r
                THEN 'T' ELSE 'LGT' END END AS method,
         CASE WHEN s.b9 IS NOT NULL THEN
           CASE WHEN sw.switch_r IS NOT NULL AND s.r < sw.switch_r
                THEN round(s.turing, 9) ELSE s.lgt END END AS r_star
  FROM staged s CROSS JOIN sw
),
norm AS (
  SELECT sum(CAST(n_r AS HUGEINT)
             * CAST(round(r_star * 1e9) AS HUGEINT)) AS norm9
  FROM starred
)
SELECT st.r, st.n_r,
       round(st.z_r, 6) AS z_r,
       round(st.r_star, 6) AS r_star,
       st.method,
       round(CASE WHEN st.n1 IS NOT NULL
                  THEN CAST(st.n1 AS DOUBLE) / CAST(st.big_n AS DOUBLE)
                  ELSE 0.0 END, 8) AS p0,
       round((1.0 - CASE WHEN st.n1 IS NOT NULL
                         THEN CAST(st.n1 AS DOUBLE) / CAST(st.big_n AS DOUBLE)
                         ELSE 0.0 END)
             * st.r_star
             / (CAST(norm.norm9 AS DOUBLE) / 1e9), 8) AS p_word
FROM starred st CROSS JOIN norm
"""

"""T64 — mergeable HDR-histogram quantile sketches, relationally.

Crawl and corpus QA run on distributions, not means: p50/p99 fetch
latency per host (politeness tuning), token-length percentiles per
language (chunking/packing budgets), response-size tails (trap and
abuse signals). Exact distributed quantiles need a global sort per
query; the standard production answer is a mergeable quantile sketch
kept per key and combined across crawl batches.

This is the HDR-histogram construction (Gene Tene's public
HdrHistogram; the same base-2-with-sub-buckets layout DDSketch, Masson
et al. VLDB 2019, analyzes): a nonnegative integer value lands in
bucket

    e   = bit_length(v) - 1          (its power-of-two exponent)
    sub = v DIV 2^(e-s) - 2^s        (the next s bits), for e > s
    sub = v - 2^e                    (exact), for e <= s

so every bucket spans at most 2^(e-s) integers and the bucket's lower
bound under-estimates v by a RELATIVE error < 2^-s (s = ``sub_bits``).
Values <= 2^s are represented exactly. v = 0 gets the dedicated bucket
(e, sub) = (-1, 0).

Like the HLL register table (operators/hll.py), the sketch IS a
DataFrame — ``(key..., e, sub, cnt)`` — which buys the same three
properties:

* **merge is a slim group-by sum** (``hdr_merge``) — counts are a
  commutative monoid, so per-batch/per-day sketches combine without
  re-reading values;
* **the identical math runs on any ANSI-SQL engine** — bucketing is
  bit-length (``conv``/``bin``) + integer division, the quantile cut
  is an integer cumulative-count threshold, and the reported value is
  the bucket lower bound: an INTEGER. No float enters the sketch or
  the answer; the only double is the nearest-rank target
  ``ceil(q * n)``, computed as an IEEE double product in BOTH engines
  (the oracle must spell ``CAST(q AS DOUBLE)`` — DuckDB parses bare
  decimal literals as exact DECIMAL and would round differently);
* **the bucket table is auditable, bounded state** — at most
  keys × (64 - s) × 2^s rows (s=5 → ≤ 1888/key at any data size), so
  quantile queries and merges are dimension-sized work.

Plan shape at 100 TB: sketching is ONE exchange keyed
(key..., e, sub) with map-side partial sum — values reduce to three
small integers in the map stage. Quantile evaluation runs two windows
over the bounded bucket table (cumulative count + total), never over
the data.

No reference counterpart (warcsum has no approximate operators); the
algorithm and layout are public (HdrHistogram; DDSketch VLDB 2019).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hdr_columns(value: Column, sub_bits: int = 5) -> tuple[Column, Column]:
    """(e, sub) bucket coordinates for one nonnegative integer value.
    Pure integer/string ops (bit length via base-2 ``conv``), exact on
    any engine. Negative inputs raise at evaluation via the caller's
    contract (use ``greatest(v, 0)`` upstream if clamping is wanted)."""
    if not 0 <= sub_bits <= 8:
        raise ValueError(f"sub_bits must be in [0, 8], got {sub_bits}")
    v = value.cast("long")
    e = (F.length(F.conv(v.cast("string"), 10, 2)) - 1).cast("int")
    two_e = F.pow(F.lit(2.0), e.cast("double")).cast("long")  # exact: 2^e
    two_es = F.pow(F.lit(2.0), (e - sub_bits).cast("double")).cast("long")
    sub = F.when(e <= sub_bits, v - two_e).otherwise(
        (v / two_es).cast("long") - (1 << sub_bits)
    )
    e_out = F.when(v <= 0, F.lit(-1)).otherwise(e)
    sub_out = F.when(v <= 0, F.lit(0)).otherwise(sub)
    return e_out, sub_out.cast("long")


def hdr_lower_bound(e: Column, sub: Column, sub_bits: int = 5) -> Column:
    """The bucket's smallest member — the sketch's quantile answer
    (under-estimates by a relative error < 2^-sub_bits)."""
    two_e = F.pow(F.lit(2.0), e.cast("double")).cast("long")
    two_es = F.pow(
        F.lit(2.0), (e - sub_bits).cast("double")
    ).cast("long")
    return (
        F.when(e < 0, F.lit(0))
        .when(e <= sub_bits, two_e + sub)
        .otherwise(((1 << sub_bits) + sub) * two_es)
    )


def hdr_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    sub_bits: int = 5,
) -> DataFrame:
    """(key..., e, sub, cnt) — the bucket table. ONE exchange keyed
    (key..., e, sub) with map-side partial counts; only non-empty
    buckets materialize."""
    e, sub = hdr_columns(F.col(value_col), sub_bits)
    return (
        df.select(*key_cols, e.alias("e"), sub.alias("sub"))
        .groupBy(*key_cols, "e", "sub")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Combine sketches built with the same sub_bits: union + re-sum.
    Idempotent-free but commutative/associative — the counts monoid."""
    if not sketches:
        raise ValueError("hdr_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("cnt",)]
    group = [c for c in keys if c not in ("e", "sub")] + ["e", "sub"]
    return out.groupBy(*group).agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    qs: list[float],
    sub_bits: int = 5,
) -> DataFrame:
    """(key..., q, value, n) — nearest-rank quantiles from the bucket
    table: the lower bound of the first bucket whose cumulative count
    reaches ceil(q * n). Two windows + one aggregate over the BOUNDED
    bucket table; the data is never touched."""
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be non-empty, each in (0, 1]: {qs}")
    wk = Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()
    w_cum = wk.orderBy("e", "sub").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lb = hdr_lower_bound(F.col("e"), F.col("sub"), sub_bits)
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(wk))
        .withColumn("lb", lb)
    )
    q_arr = F.array(*[F.lit(float(q)) for q in sorted(qs)])
    return (
        cum.select(*key_cols, "cum", "n", "lb", F.explode(q_arr).alias("q"))
        # nearest-rank target: IEEE double product in both engines
        .withColumn("target", F.ceil(F.col("q") * F.col("n").cast("double")))
        .groupBy(*key_cols, "q")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.col("target"), F.col("lb"))
            ).alias("value"),
            F.max("n").alias("n"),
        )
    )


def hdr_sketch_sql(
    source_sql: str,
    key_cols: list[str],
    value_col: str,
    sub_bits: int = 5,
) -> str:
    """The identical bucketing as a DuckDB CTE body over ``source_sql``
    (which must yield key_cols + value_col)."""
    keys = ", ".join(key_cols)
    keys_pfx = f"{keys}, " if keys else ""
    v = f"CAST({value_col} AS BIGINT)"
    e = f"(length(bin({v})) - 1)"
    two_e = f"CAST(power(2, {e}) AS BIGINT)"
    two_es = f"CAST(power(2, {e} - {sub_bits}) AS BIGINT)"
    sub = (
        f"CASE WHEN {e} <= {sub_bits} THEN {v} - {two_e} "
        f"ELSE CAST(floor({v} / {two_es}) AS BIGINT) - {1 << sub_bits} END"
    )
    return (
        f"SELECT {keys_pfx}"
        f"CASE WHEN {v} <= 0 THEN -1 ELSE {e} END AS e, "
        f"CASE WHEN {v} <= 0 THEN 0 ELSE {sub} END AS sub, "
        f"count(*) AS cnt FROM ({source_sql}) "
        f"GROUP BY {keys_pfx}e, sub"
    )


def hdr_quantiles_sql(
    sketch_sql: str,
    key_cols: list[str],
    qs: list[float],
    sub_bits: int = 5,
) -> str:
    """The identical quantile evaluation in DuckDB over a sketch CTE.
    ``q * n`` is forced to DOUBLE — DuckDB would otherwise evaluate the
    bare literal as exact DECIMAL and round ceil() differently from
    Spark's double product."""
    keys = ", ".join(key_cols)
    keys_pfx = f"{keys}, " if keys else ""
    part = f"PARTITION BY {keys}" if key_cols else ""
    e_, s_ = "e", "sub"
    two_e = f"CAST(power(2, {e_}) AS BIGINT)"
    two_es = f"CAST(power(2, {e_} - {sub_bits}) AS BIGINT)"
    lb = (
        f"CASE WHEN {e_} < 0 THEN 0 "
        f"WHEN {e_} <= {sub_bits} THEN {two_e} + {s_} "
        f"ELSE ({1 << sub_bits} + {s_}) * {two_es} END"
    )
    # CAST: DuckDB types bare decimal literals as exact DECIMAL; the
    # Spark side emits doubles, and the target arithmetic needs IEEE
    q_values = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in sorted(qs))
    return f"""
WITH sk AS ({sketch_sql}),
cum AS (
  SELECT {keys_pfx}
         sum(cnt) OVER ({part} ORDER BY e, sub
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER ({part}) AS n,
         {lb} AS lb
  FROM sk
)
SELECT {keys_pfx}q, min(CASE WHEN cum >= target THEN lb END) AS value,
       max(n) AS n
FROM (
  SELECT cum.*, qq.q,
         ceil(CAST(qq.q AS DOUBLE) * CAST(n AS DOUBLE)) AS target
  FROM cum CROSS JOIN (VALUES {q_values}) qq(q)
)
GROUP BY {keys_pfx}q
"""

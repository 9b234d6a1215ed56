"""T43 — mergeable HyperLogLog cardinality sketches, relationally.

Crawl engineering runs on per-host distinct counts: how many unique
URLs has a host contributed to the frontier, how many distinct pages
did this segment add, how fast is a host's URL space growing between
crawls (trap signal, recrawl budget input). Exact ``count_distinct``
per host re-shuffles the URL strings every time and cannot be
combined across crawl batches without re-reading them; the classic
answer is a HyperLogLog sketch (Flajolet et al. 2007) per host.

Here the sketch IS a DataFrame — ``(key..., bucket, max_rank)`` — and
every step is a relational expression:

* ``bucket``  = first 32 hash bits mod m (m = 2^p registers)
* ``rank``    = 1 + leading-zero count of the next 32 hash bits
                (position of the first '1' in the zero-padded binary
                string — pure string ops, no floats)
* register    = ``max(rank)`` per (key, bucket)

which buys three things a binary-blob sketch (Spark's own
``hll_sketch_agg``, DataSketches) does not:

* **merge is union + max** — a monotone semilattice, so sketches from
  different crawl batches / days / segments combine with a slim
  group-by, never touching raw URLs again (``hll_merge``), and the
  merge is idempotent, commutative, associative by construction;
* **the identical math runs on any ANSI-SQL engine** — the DuckDB
  oracle computes the same registers and the same estimate and the
  driver gate compares hash-exact (md5 is the shared hash, the
  bit-twiddling is ``lpad``/``strpos`` on a binary string, and the
  register-sum Σ2^-M is EXACT in doubles — every term is a power of
  two ≥ 2^-33 and the sum stays < 2^p+1, so order of summation
  cannot change a single bit);
* **the register table is auditable state** — it checkpoints to the
  same parquet/Iceberg layout as the frontier state and diffs between
  crawls are meaningful (a register that grew = new content seen).

Plan shape at 100 TB: the sketch is ONE exchange keyed on
(key, bucket) with map-side partial ``max`` — URL strings are reduced
to (host, int, int) triples in the map stage and never reshuffle; the
register table is bounded by keys × m rows (hosts × 2^p — dimension
sized), and estimation/merging run entirely on it. Estimate accuracy
is the standard ±1.04/sqrt(m) (p=10 → ±3.3%), with linear-counting
small-range correction and the 32-bit large-range correction.

No reference counterpart (warcsum has no approximate operators); the
algorithm is public (Flajolet et al., AOFA 2007).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rank for a hash whose 32-bit suffix is all zeros (w + 1)
_RANK_ZERO = 33


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. §4)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_columns(value: Column, p: int = 10) -> tuple[Column, Column]:
    """(bucket, rank) for one value: md5 → 32-bit bucket bits mod 2^p,
    then 1 + leading-zeros of the NEXT 32 bits via lpad/strpos on the
    binary string — integer/string ops only, reproducible on any
    engine that has md5."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    hh = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(hh, 1, 8), 16, 10).cast("long") % (1 << p)
    suffix_bin = F.conv(F.substring(hh, 9, 8), 16, 2)
    pos = F.instr(F.lpad(suffix_bin, 32, "0"), "1")
    rank = F.when(pos == 0, F.lit(_RANK_ZERO)).otherwise(pos)
    return bucket, rank


def hll_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """(key..., bucket, max_rank) — the register table. ONE exchange
    keyed (key..., bucket), partial max map-side; only non-empty
    registers are materialized (empty ones are implied by m)."""
    bucket, rank = hll_columns(F.col(value_col), p)
    return (
        df.select(*key_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(
    *sketches: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Combine register tables from different batches: union + max.
    Operates only on (key, bucket, max_rank) rows — raw data is never
    revisited. Idempotent/commutative/associative, so batches may be
    merged in any order or more than once.

    ``key_cols`` (must include ``bucket``) collapses extra key columns
    — e.g. a sketch keyed ``(host, crawl_batch)`` merges down to one
    per host with ``key_cols=["host", "bucket"]``, a single group-by
    on the dimension-sized register table."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = key_cols or [c for c in out.columns if c != "max_rank"]
    if "bucket" not in keys:
        raise ValueError("key_cols must include 'bucket'")
    return out.groupBy(*keys).agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(
    sketch: DataFrame,
    key_cols: list[str],
    p: int = 10,
    decimals: int = 4,
) -> DataFrame:
    """(key..., est_distinct) from a register table. Runs entirely on
    the dimension-sized sketch. Raw estimate αm·m²/Σ2^-M with
    linear-counting small-range and 32-bit large-range corrections;
    rounded so independent engines agree to the digit."""
    m = 1 << p
    two32 = float(1 << 32)
    agg = sketch.groupBy(*key_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"),
        F.count("*").alias("_nz"),
    )
    zeros = F.lit(m) - F.col("_nz")
    # empty registers contribute 2^-0 = 1 each to the harmonic sum
    raw = F.lit(_alpha(m) * m * m) / (F.col("_s") + zeros.cast("double"))
    est = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(
        *key_cols, F.round(est, decimals).alias("est_distinct")
    )


def hll_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Convenience: sketch + estimate in one call."""
    return hll_estimate(hll_sketch(df, key_cols, value_col, p), key_cols, p)


def hll_oracle_sql(
    source_cte: str,
    key_expr: str,
    value_expr: str,
    p: int = 10,
    decimals: int = 4,
    key_alias: str = "k",
) -> str:
    """The SAME math as ANSI SQL (DuckDB dialect) for the driver gate —
    generated next to the implementation so the two cannot drift.
    ``source_cte`` must define a relation ``src``; key_expr/value_expr
    are SQL expressions over it; the output key column is named
    ``key_alias`` to line up with the Spark side."""
    m = 1 << p
    alpha = _alpha(m)
    return f"""
WITH {source_cte},
hashed AS (
  SELECT {key_expr} AS k, md5(CAST({value_expr} AS VARCHAR)) AS hh FROM src
), br AS (
  SELECT k,
         CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % {m} AS bucket,
         CASE WHEN CAST(('0x' || substr(hh, 9, 8)) AS BIGINT) = 0 THEN {_RANK_ZERO}
              ELSE strpos(lpad(bin(CAST(('0x' || substr(hh, 9, 8)) AS BIGINT)), 32, '0'), '1')
         END AS rank
  FROM hashed
), regs AS (
  SELECT k, bucket, max(rank) AS max_rank FROM br GROUP BY k, bucket
), agg AS (
  SELECT k, sum(power(2.0, -max_rank)) AS s, count(*) AS nz
  FROM regs GROUP BY k
), est AS (
  SELECT k,
         CAST({alpha!r} AS DOUBLE) * {m} * {m} / (s + ({m} - nz)) AS raw,
         {m} - nz AS zeros
  FROM agg
)
SELECT k AS {key_alias},
       round(CASE
         WHEN raw <= 2.5 * {m} AND zeros > 0
           THEN {m}.0 * ln({m}.0 / zeros)
         WHEN raw > 4294967296.0 / 30.0
           THEN -4294967296.0 * ln(1.0 - raw / 4294967296.0)
         ELSE raw
       END, {decimals}) AS est_distinct
FROM est
"""

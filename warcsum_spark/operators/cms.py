"""T47 — mergeable Count-Min sketches + heavy hitters, relationally.

The frequency twin of the T43 HyperLogLog: crawl and corpus accounting
need *how often* as much as *how many distinct* — hottest URLs hitting
the frontier, hottest terms in a segment, hottest hosts in a fetch log
— and they need those counts combined ACROSS crawl batches without
re-reading them. Exact per-key counts of a heavy-tailed stream are one
giant shuffle whose hot keys are exactly the problem; the classic
answer is a Count-Min sketch (Cormode & Muthukrishnan 2005): d hash
rows × w counters, point increment, point estimate = min over the d
rows, overestimate-only error ≤ εN with ε = e/w.

As with the HLL, the sketch IS a DataFrame — ``(key..., row_id,
bucket, cnt)`` — and every step is a relational expression:

* per value, d (row_id, bucket) pairs: ``bucket_j`` = first 32 bits of
  ``md5(j || ':' || value)`` mod w — the j-prefix makes the d rows
  pairwise-independent hash functions from one md5;
* sketch = ``sum(weight)`` per (key..., row_id, bucket) — ONE exchange
  of (ints, long) triples, value strings reduced map-side and never
  reshuffled;
* merge = union + sum (commutative/associative; counters are linear,
  so batch sketches add — unlike the HLL's max-lattice this one is
  NOT idempotent: merge each batch exactly once);
* estimate = candidates hashed the same way, joined against the
  dimension-sized sketch, ``min(cnt)`` over the d rows (missing
  bucket = 0).

The identical math runs on any ANSI-SQL engine: ``cms_oracle_sql`` is
generated beside the implementation (md5 + integer ops + group-by +
min), and the driver gate compares hash-exact — the sketch registers
and the estimates, not just "close".

Heavy-hitter enumeration: a CMS cannot enumerate keys, only score
them. ``cms_topk`` therefore takes an explicit CANDIDATE relation
(distinct keys of the current batch, a sampled pool, or the previous
round's top-k — the standard sketch-plus-candidates pattern) and
returns the top-k by estimated count with a deterministic tiebreak.
At 100 TB the candidate pool is dimension-sized by construction while
the sketch absorbs the full stream, so the join broadcasts.

No reference counterpart (warcsum has no approximate operators); the
algorithm is public (Cormode & Muthukrishnan, J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check(d: int, w: int) -> None:
    if not 1 <= d <= 8:
        raise ValueError(f"d must be in [1, 8], got {d}")
    if not (16 <= w <= (1 << 20)):
        raise ValueError(f"w must be in [16, 2^20], got {w}")


def cms_bucket(value: Column, j: int, w: int) -> Column:
    """Row-j bucket for one value: md5 of the j-prefixed string, first
    32 hash bits mod w. Integer/string ops only — reproducible on any
    engine with md5."""
    hh = F.md5(F.concat(F.lit(f"{j}:"), value.cast("string")))
    return F.conv(F.substring(hh, 1, 8), 16, 10).cast("long") % w


def _pairs(value: Column, d: int, w: int) -> Column:
    """array<struct<row_id,bucket>> of the d hash positions — built in
    ONE projection so the source is scanned once and exploded map-side
    (no d-way union re-scan)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row_id"),
                cms_bucket(value, j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """(key..., row_id, bucket, cnt) — the counter table, one sketch
    per key group. ONE exchange keyed (key..., row_id, bucket) with
    map-side partial sum; only touched counters materialize (empty
    ones are implied zeros). ``weight_col`` counts each row that many
    times (e.g. pre-aggregated (term, n) inputs); default weight 1."""
    _check(d, w)
    weight = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    return (
        df.select(
            *key_cols,
            F.explode(_pairs(F.col(value_col), d, w)).alias("h"),
            weight.alias("_w"),
        )
        .groupBy(*key_cols, F.col("h.row_id").alias("row_id"), F.col("h.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Combine counter tables from different batches: union + sum on
    the dimension-sized sketches — raw streams are never revisited.
    Counters are linear, so this is exact merge of the sketches; NOT
    idempotent (merge each batch once). ``key_cols`` (must include
    row_id and bucket) collapses extra key columns, e.g. per-day
    sketches down to one per host."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = key_cols or [c for c in out.columns if c != "cnt"]
    if "row_id" not in keys or "bucket" not in keys:
        raise ValueError("key_cols must include 'row_id' and 'bucket'")
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    key_cols: list[str] | None = None,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """(key..., item, est_cnt) — point estimates for every row of
    ``items`` (which must carry ``key_cols`` too when the sketch is
    keyed). Candidates are hashed with the same d functions, LEFT-join
    the counter table on (key..., row_id, bucket) — missing counter =
    0 — and take min over the d rows. The sketch side is broadcast:
    it is bounded by keys × d × w rows (dimension-sized by
    construction), while candidates may be a full distinct-key
    relation."""
    _check(d, w)
    keys = key_cols or []
    hashed = items.select(
        *keys,
        F.col(item_col).alias("item"),
        F.explode(_pairs(F.col(item_col), d, w)).alias("h"),
    ).select(
        *keys,
        "item",
        F.col("h.row_id").alias("row_id"),
        F.col("h.bucket").alias("bucket"),
    )
    joined = hashed.join(
        F.broadcast(sketch), on=[*keys, "row_id", "bucket"], how="left"
    ).select(*keys, "item", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy(*keys, "item").agg(
        F.min("cnt").alias("est_cnt")
    )


def cms_topk(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    k: int = 10,
    key_cols: list[str] | None = None,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """(key..., rank, item, est_cnt): top-k candidates per key group by
    estimated count, ties broken by item ASC (deterministic across
    engines). Runs on the estimate relation — candidate-pool sized."""
    from pyspark.sql import Window

    keys = key_cols or []
    est = cms_estimate(sketch, candidates, item_col, keys, d, w)
    win = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        F.desc("est_cnt"), F.asc("item")
    )
    return (
        est.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", "item", "est_cnt")
    )


def cms_oracle_sql(
    source_cte: str,
    value_expr: str,
    k: int = 10,
    d: int = 3,
    w: int = 1024,
    weight_expr: str = "1",
) -> str:
    """The SAME math as ANSI SQL (DuckDB dialect) for the driver gate —
    generated next to the implementation so the two cannot drift.
    ``source_cte`` must define a relation ``src``; the candidate pool
    is ``SELECT DISTINCT value FROM src`` (what the driver query uses).
    Output: (rank, item, est_cnt) — global top-k, tie item ASC."""
    _check(d, w)
    js = ", ".join(str(j) for j in range(d))
    return f"""
WITH {source_cte},
vals AS (
  SELECT CAST({value_expr} AS VARCHAR) AS v, CAST({weight_expr} AS BIGINT) AS wt FROM src
),
hashed AS (
  SELECT v, wt, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 8)) AS BIGINT) % {w} AS bucket
  FROM vals CROSS JOIN (SELECT unnest([{js}]) AS j)
),
sketch AS (
  SELECT j, bucket, sum(wt) AS cnt FROM hashed GROUP BY j, bucket
),
cand AS (
  SELECT DISTINCT v FROM vals
),
cand_h AS (
  SELECT v, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 8)) AS BIGINT) % {w} AS bucket
  FROM cand CROSS JOIN (SELECT unnest([{js}]) AS j)
),
est AS (
  SELECT ch.v, min(COALESCE(s.cnt, 0)) AS est_cnt
  FROM cand_h ch LEFT JOIN sketch s ON s.j = ch.j AND s.bucket = ch.bucket
  GROUP BY ch.v
),
ranked AS (
  SELECT v, est_cnt,
         row_number() OVER (ORDER BY est_cnt DESC, v ASC) AS rank
  FROM est
)
SELECT rank, v AS item, est_cnt FROM ranked WHERE rank <= {k}
"""

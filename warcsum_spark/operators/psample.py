"""T84 — deterministic fixed-size weighted sampling per stratum
(priority sampling, Duffield, Lund & Thorup, JACM 54(6) 2007, "Priority
sampling for estimation of arbitrary subset sums").

`sample_stratified` (functions/sampling.py) keeps a RATE per stratum;
corpus curation just as often needs a QUOTA — "exactly k documents per
language/domain, preferring heavier (longer / higher-quality) ones, but
never deterministically dropping the light tail". Weighted
sampling-without-replacement does that; priority sampling is the
variant whose per-item key

    priority_i = w_i / u_i,   u_i ~ Uniform(0, 1]

needs ONE floating-point division, and whose top-k sample carries a
built-in unbiased subset-sum estimator: with tau = the (k+1)-th largest
priority in the stratum, each sampled item represents

    w_hat_i = max(w_i, tau)      (w_hat_i = w_i when the stratum has
                                  <= k items and nothing was dropped)

so sum(w_hat) over any sampled subset is an unbiased estimate of that
subset's true total weight (DLT 2007, Thm 1) — the property that lets a
downsampled corpus still answer "how many tokens did this domain
really have?".

Cross-engine determinism (the repo's md5 idiom, functions/sampling.py):
u_i is a pure function of (seed, id) — the first 13 hex digits of
``md5(seed ':' id)`` read as a 52-bit integer v, then

    u_i = (v + 1) / 2^52        (exact: v+1 <= 2^52 is representable,
                                 division by a power of two is exact)
    priority_i = w_i / u_i      (single IEEE-754 division, correctly
                                 rounded -> bit-identical in the JVM and
                                 any C engine; no ln/pow whose libm
                                 last-ulp could flip a rank)

No RNG state, no ordering dependence: membership survives re-runs,
re-partitioning, engine swaps, and cluster resizes, and the DuckDB
driver-gate oracle recomputes it from the same parquet bytes.

Plan shape at 10^10 rows: priority is a map-only JVM expression; the
only exchange is the hash partition on the stratum feeding a
row_number window (per-stratum top-k — Spark's WindowExec streams each
partition, never materializing more than the frame). For pathological
strata (one domain = half the corpus) ``salt_buckets`` enables the
politeness-queue trick (frontier/politeness.py): phase 1 keeps the
top-(k+1) within (stratum, salt) — a superset of the global top-(k+1),
since any globally-top row is top within its bucket — phase 2 re-ranks
the <= salt_buckets*(k+1) survivors unsalted. tau still comes from the
full stratum's (k+1)-th priority, which phase 1 preserves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_52 = float(1 << 52)  # 4503599627370496.0


def _uniform(id_col: Column, seed: int) -> Column:
    """Deterministic u in (0, 1]: 52 bits of md5(seed ':' id), exact."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    return (v + F.lit(1)).cast("double") / F.lit(_TWO_52)


def uniform_sql(id_expr: str, seed: int = 42) -> str:
    """DuckDB expression for the identical u — hex digits via strpos
    arithmetic (the bucket_sql idiom; DuckDB has no hex->int conv),
    accumulated exactly in BIGINT, then the same exact /2^52."""
    h = f"md5('{seed}:' || CAST({id_expr} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"(CAST(({digits}) + 1 AS DOUBLE) / 4503599627370496.0)"


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    salt_buckets: int = 0,
) -> DataFrame:
    """Top-k-by-priority rows per stratum with the DLT estimator:
    (stratum, id, weight, priority, est_weight). ``weight_col`` must be
    strictly positive. ``est_weight = max(weight, tau)`` where tau is
    the stratum's (k+1)-th priority (= weight itself when the stratum
    was not actually truncated) — sum(est_weight) over the sample
    estimates the stratum's true weight total, unbiased."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
    ).withColumn("priority", F.col("weight") / _uniform(F.col("id"), seed))

    if salt_buckets and salt_buckets > 1:
        # phase 1: per-(stratum, salt) top-(k+1) — keeps every candidate
        # for both the sample (top k) and tau (the (k+1)-th priority)
        w1 = Window.partitionBy("stratum", "_salt").orderBy(
            F.col("priority").desc(), F.col("id").asc()
        )
        base = (
            base.withColumn("_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(salt_buckets)))
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k + 1)
            .drop("_salt", "_r1")
        )

    w = Window.partitionBy("stratum").orderBy(
        F.col("priority").desc(), F.col("id").asc()
    )
    ws = Window.partitionBy("stratum")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "tau", F.max(F.when(F.col("rn") == k + 1, F.col("priority"))).over(ws)
    )
    return (
        ranked.filter(F.col("rn") <= k)
        .select(
            "stratum",
            "id",
            "weight",
            "priority",
            F.greatest(F.col("weight"), F.coalesce(F.col("tau"), F.col("weight"))).alias(
                "est_weight"
            ),
        )
    )


def priority_sample_sql(
    source_cte: str,
    k: int,
    seed: int = 42,
) -> str:
    """The identical sampling math as DuckDB SQL, generated beside the
    implementation. ``source_cte`` must define ``src(stratum, id,
    weight)`` with weight already DOUBLE and > 0."""
    u = uniform_sql("s.id", seed)
    return f"""
WITH {source_cte},
pri AS (
  SELECT s.stratum, s.id, s.weight, s.weight / {u} AS priority
  FROM src s
),
ranked AS (
  SELECT stratum, id, weight, priority,
         row_number() OVER (PARTITION BY stratum
                            ORDER BY priority DESC, id ASC) AS rn
  FROM pri
),
tagged AS (
  SELECT stratum, id, weight, priority, rn,
         max(CASE WHEN rn = {k + 1} THEN priority END)
             OVER (PARTITION BY stratum) AS tau
  FROM ranked
)
SELECT stratum, id, weight,
       round(priority, 6) AS priority,
       round(greatest(weight, coalesce(tau, weight)), 6) AS est_weight
FROM tagged WHERE rn <= {k}
"""

"""T68 — embedding centroid drift between crawl batches.

Training-data pipelines monitor DISTRIBUTION SHIFT between ingestion
batches: if this week's crawl of a domain/language suddenly embeds far
from last week's centroid, something changed — the site redesigned,
extraction broke, a spam campaign landed, or the language-ID started
mislabeling. The standard cheap monitor is per-group centroid cosine
between batches (the embedding-space analog of T56's digest-level
snapshot diff; cf. data-drift practice in ML monitoring literature).

Relational shape: posexplode the vector ONCE into slim
(key, pos, val) rows and average per (key, pos) — Spark's hash
aggregate combines partials MAP-SIDE, so the shuffle carries only
groups × dims rows regardless of corpus size (the explode inflation
is map-local CPU, never shuffled). The two centroid tables join on
(key, pos) — both dimension-sized — and one final aggregate folds the
cosine. Groups present in only one batch drop out (inner join); emit
them from the count frames upstream if needed.

Float stance: elements are float32 in storage; both engines cast to
DOUBLE before any arithmetic (float→double is exact), accumulate in
double, and round the single output cosine to 6 — cross-row summation
order is engine noise ~1e-13, absorbed by the output rounding (the
lm_score.py discipline).

No reference counterpart; practice is public (embedding-drift
monitoring; Abbas et al. 2023 use the same per-cluster centroid
machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _centroids(
    emb: DataFrame, key_cols: list[str], vec_col: str, side: str
) -> DataFrame:
    exploded = emb.select(
        *key_cols, F.posexplode(vec_col).alias("pos", "_v")
    ).select(*key_cols, "pos", F.col("_v").cast("double").alias("val"))
    return exploded.groupBy(*key_cols, "pos").agg(
        F.avg("val").alias(f"c_{side}")
    )


def _counts(emb: DataFrame, key_cols: list[str], side: str) -> DataFrame:
    return emb.groupBy(*key_cols).agg(F.count("*").alias(f"n_{side}"))


def centroid_drift(
    batch_a: DataFrame,
    batch_b: DataFrame,
    key_cols: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """(key..., n_a, n_b, cosine) — cosine similarity between the two
    batches' per-key centroids (1.0 = no drift), for keys present in
    BOTH batches. round-6 at output only."""
    ca = _centroids(batch_a, key_cols, vec_col, "a")
    cb = _centroids(batch_b, key_cols, vec_col, "b")
    joined = ca.join(cb, [*key_cols, "pos"])
    cos = F.round(
        F.sum(F.col("c_a") * F.col("c_b"))
        / (
            F.sqrt(F.sum(F.col("c_a") * F.col("c_a")))
            * F.sqrt(F.sum(F.col("c_b") * F.col("c_b")))
        ),
        6,
    )
    sims = joined.groupBy(*key_cols).agg(cos.alias("cosine"))
    return (
        sims.join(_counts(batch_a, key_cols, "a"), key_cols)
        .join(_counts(batch_b, key_cols, "b"), key_cols)
        .select(*key_cols, "n_a", "n_b", "cosine")
    )


def drift_oracle_sql(
    emb_a_sql: str,
    emb_b_sql: str,
    key_cols: list[str],
    vec_col: str = "embedding",
) -> str:
    """The identical centroids + cosine in DuckDB. Positions are
    engine-internal join keys (1-based there, 0-based in Spark) and
    never reach the output, so no alignment is needed."""
    keys = ", ".join(key_cols)

    def cent(src: str, side: str) -> str:
        return f"""
SELECT {keys}, pos, avg(val) AS c_{side} FROM (
  SELECT {keys}, pos, CAST({vec_col}[pos] AS DOUBLE) AS val FROM (
    SELECT {keys}, {vec_col},
           unnest(generate_series(1, len({vec_col}))) AS pos
    FROM ({src})
  )
) GROUP BY {keys}, pos"""

    return f"""
WITH ca AS MATERIALIZED ({cent(emb_a_sql, "a")}),
cb AS MATERIALIZED ({cent(emb_b_sql, "b")}),
na AS (SELECT {keys}, count(*) AS n_a FROM ({emb_a_sql}) GROUP BY {keys}),
nb AS (SELECT {keys}, count(*) AS n_b FROM ({emb_b_sql}) GROUP BY {keys}),
sims AS (
  SELECT {", ".join("ca." + k for k in key_cols)},
         round(sum(c_a * c_b)
               / (sqrt(sum(c_a * c_a)) * sqrt(sum(c_b * c_b))), 6)
           AS cosine
  FROM ca JOIN cb USING ({keys}, pos)
  GROUP BY {", ".join("ca." + k for k in key_cols)}
)
SELECT {", ".join("sims." + k for k in key_cols)}, n_a, n_b, cosine
FROM sims JOIN na USING ({keys}) JOIN nb USING ({keys})
"""

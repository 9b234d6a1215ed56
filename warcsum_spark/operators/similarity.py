"""Similarity search over an embedding column (array<float>).

* **brute-force cosine top-k** — the exactness baseline: query set ⋈
  corpus with the dot product as a JVM ``zip_with``/``aggregate``
  expression, top-k per query via window. Broadcast the (small) query
  side; the corpus is never shuffled. O(|Q|·N) compute but embarrassingly
  parallel and shuffle-free until the final top-k (k rows per query per
  partition after partial ranking).
* **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (sign of dot with seeded Gaussian planes → n_bits-bit key), candidates
  share a bucket in ≥1 of n_tables independent tables; exact cosine is
  computed only within buckets. Recall tunes with n_tables/n_bits.

Plane generation is seeded and deterministic (no Date.now/Math.random in
any path); all ranking ties break on vec_id ASC for reproducibility.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score, rank) — exact cosine top-k per query.

    ``queries`` (query_id, embedding) is broadcast: the corpus scan stays
    partition-local; only k·|Q| rows per partition reach the rank shuffle.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")
    ).join(F.broadcast(q))
    scored = scored.withColumn(
        "score", F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _planes(dim: int, n_bits: int, table: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.randn(n_bits, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """n_bits-bit random-hyperplane signature as a long (JVM expressions)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 32,
    n_bits: int = 8,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cosine ≥
    threshold) via hyperplane-LSH self-bucketing: exact cosine only within
    shared buckets, never a cross join. Near-dup embeddings (cos ≥ 0.95 →
    angle ≤ 18°) collide in ≥1 of n_tables with high probability."""
    base = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    buckets = base.select(
        "vec_id",
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        lsh_signature(F.col("_v"), _planes(dim, n_bits, t, seed)).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "_v", "b.table_id", "b.sig")
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        pairs.withColumn("cosine", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 32,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: exact scoring restricted to bucket-mates
    in any of ``n_tables`` hyperplane tables."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c_buckets = c.select(
        "vec_id",
        "_cvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        lsh_signature(F.col("_cvec"), _planes(dim, n_bits, t, seed)).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("bucket"),
    ).select("vec_id", "_cvec", "bucket.table_id", "bucket.sig")
    q_buckets = q.select(
        "query_id",
        "_qvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        lsh_signature(F.col("_qvec"), _planes(dim, n_bits, t, seed)).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("bucket"),
    ).select("query_id", "_qvec", "bucket.table_id", "bucket.sig")

    cands = (
        c_buckets.join(F.broadcast(q_buckets), ["table_id", "sig"])
        .select("query_id", "vec_id", "_qvec", "_cvec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.withColumn("score", F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )

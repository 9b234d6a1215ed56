"""T106 — product quantization ANN with asymmetric distance (Jégou,
Douze & Schmid, "Product quantization for nearest neighbor search",
TPAMI 2011).

The standard 10^10-vector scale path for embedding search: split the
vector into ``m`` subspaces, vector-quantize each with a tiny ``k``-
centroid codebook, and the corpus shrinks from dim floats to m bytes
per vector. Queries stay exact on their side (ADC — asymmetric
distance): per query, an m×k lookup table of squared L2 distances from
each query SUBvector to each centroid; a corpus vector's approximate
distance is then m table lookups and m−1 additions, no float math on
the corpus payload at all. Complements T2's IVF (coarse routing) — in
production the two compose as IVFADC (ibid. §5.2); here each is
gated separately.

Pinned, engine-portable semantics:

* codebooks are a MODEL, not a query (the IVF-quantizer discipline,
  similarity.py::train_ivf_centroids): trained by plain Lloyd k-means
  per subspace on a bounded deterministic sample — the ``train_size``
  LOWEST ids via orderBy+limit (TakeOrdered; scan-order independent,
  so the DuckDB oracle regenerates IDENTICAL codebooks from the same
  parquet with the shared pure-numpy trainer);
* encoding: code_j = argmin over centroids of squared L2 in subspace
  j, ties → lowest centroid id (numpy first-min == the oracle's
  ``ORDER BY d, cid`` — pinned);
* the ADC lookup table is built by ``pq_lut`` with a SEQUENTIAL
  left-to-right accumulation (plain Python floats — the rproj.py
  bit-exactness discipline), and the oracle inlines those exact
  doubles, so the final distances agree bit-for-bit BY CONSTRUCTION:
  ``adc = lut[0·k+c0] + lut[1·k+c1] + …`` is the same pinned
  left-to-right chain in both engines, rounded to 6;
* ranking: ``row_number`` per query over (adc_dist asc, vec_id asc).

Plan shape at 100 TB: the corpus is encoded ONCE by a vectorized
Arrow kernel (map-only; in production the m-byte codes are what you
store) and never shuffled; queries — with their luts — are BROADCAST
(the brute_force_topk discipline), so the scan stays partition-local
and only the rank exchange carries (query, vec_id, dist) rows. The
lut kernel runs on the dimension-sized QUERY table only. Training
reads <= train_size rows (bounded collect, documented — the IVF
precedent).

No reference counterpart; the method is the published one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kmeans_l2(
    X: np.ndarray, k: int, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Plain (Euclidean) Lloyd on [n, dsub] — shared by the Spark
    trainer and the oracle-side replication. Deterministic: seeded
    init, empty clusters reseeded to the worst-assigned point."""
    if len(X) < k:
        raise ValueError(f"need >= {k} training rows, got {len(X)}")
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)
        )
        assign = d.argmin(axis=1)
        worst = d[np.arange(len(X)), assign]
        for c in range(k):
            members = X[assign == c]
            if len(members) == 0:  # reseed to the globally worst-fit point
                j = int(worst.argmax())
                C[c] = X[j]
                worst[j] = -1.0
                continue
            C[c] = members.mean(axis=0)
    return C


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    train_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """[m, k, dsub] float64 codebooks from the deterministic bounded
    sample (lowest ``train_size`` ids). dim must divide by ``m``."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_size).collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            _kmeans_l2(X[:, j * dsub : (j + 1) * dsub], k, iters, seed + j)
            for j in range(m)
        ]
    )


def pq_lut(qvec, codebooks: np.ndarray) -> list[float]:
    """Flat m·k ADC table for one query — SEQUENTIAL left-to-right
    Python-float accumulation so the oracle can inline bit-identical
    constants (the rproj.py discipline)."""
    m, k, dsub = codebooks.shape
    lut: list[float] = []
    for j in range(m):
        for c in range(k):
            acc = 0.0
            for d in range(dsub):
                diff = float(qvec[j * dsub + d]) - float(codebooks[j][c][d])
                acc += diff * diff
            lut.append(acc)
    return lut


def _encode_udf(codebooks: np.ndarray):
    """Vectorized Arrow kernel: embedding → array<int> of m codes (one
    batched |x|²−2x·c+|c|² argmin per subspace; codebooks ride the
    closure — a few KB). First-min tie rule matches the oracle's
    ORDER BY d, cid."""
    m, k, dsub = codebooks.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            sub = V[:, j * dsub : (j + 1) * dsub]
            C = codebooks[j]
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ C.T)
                + (C * C).sum(axis=1)
            )
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return enc


def encode_pq(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes) — the map-only corpus encode; at 10^10 vectors
    the m-byte codes are the stored representation."""
    enc = _encode_udf(codebooks)
    return corpus.select(
        F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("codes")
    )


def _lut_udf(codebooks: np.ndarray):
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(vecs: pd.Series) -> pd.Series:
        # dimension-sized QUERY table only — the sequential fold is the
        # bit-parity contract, never the corpus hot path
        return pd.Series([pq_lut(v, codebooks) for v in vecs])

    return lut


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k_top: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, adc_dist, rank) — ADC top-``k_top`` per
    query. Queries (with their luts) are broadcast; the encoded corpus
    never shuffles before the rank exchange."""
    m, k, _ = codebooks.shape
    codes = encode_pq(corpus, codebooks, id_col, vec_col)
    lut = _lut_udf(codebooks)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        lut(F.col(vec_col)).alias("_lut"),
    )
    scored = codes.join(F.broadcast(q))
    dist = None
    for j in range(m):
        term = F.element_at(
            F.col("_lut"),
            (F.lit(j * k) + F.element_at(F.col("codes"), j + 1) + 1).cast(
                "int"
            ),
        )
        dist = term if dist is None else dist + term
    scored = scored.withColumn("adc_dist", F.round(dist, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def _sql_list(xs) -> str:
    return "[" + ", ".join(repr(float(x)) for x in xs) + "]"


def ann_pq_sql(
    corpus_sql: str,
    codebooks: np.ndarray,
    luts: dict,
    k_top: int = 10,
) -> str:
    """The IDENTICAL pinned semantics for DuckDB. ``corpus_sql`` must
    produce (vec_id, e DOUBLE[]); ``luts`` maps query_id → the exact
    ``pq_lut`` doubles (inlined as constants, so the ADC chain is
    bit-identical). Codes are recomputed IN SQL from the inlined
    centroids with the same |x|²−2x·c+|c|² expansion and the same
    first-min tie rule."""
    m, k, dsub = codebooks.shape
    cent_rows = ",\n  ".join(
        f"({j}, {c}, CAST({_sql_list(codebooks[j][c])} AS DOUBLE[]))"
        for j in range(m)
        for c in range(k)
    )
    lut_rows = ",\n  ".join(
        f"({qid}, CAST({_sql_list(lut)} AS DOUBLE[]))"
        for qid, lut in sorted(luts.items())
    )
    code_cols = ", ".join(
        f"max(CASE WHEN m = {j} THEN cid END) AS c{j}" for j in range(m)
    )
    adc = " + ".join(f"q.lut[{j * k} + pc.c{j} + 1]" for j in range(m))
    return f"""
WITH cent(m, cid, c) AS (VALUES
  {cent_rows}
),
corpus AS (SELECT vec_id, CAST(e AS DOUBLE[]) AS e FROM ({corpus_sql})),
sub AS (
  SELECT corpus.vec_id, cent.m, cent.cid,
    list_dot_product(list_slice(corpus.e, cent.m * {dsub} + 1,
                                cent.m * {dsub} + {dsub}),
                     list_slice(corpus.e, cent.m * {dsub} + 1,
                                cent.m * {dsub} + {dsub}))
    - 2 * list_dot_product(list_slice(corpus.e, cent.m * {dsub} + 1,
                                      cent.m * {dsub} + {dsub}), cent.c)
    + list_dot_product(cent.c, cent.c) AS d
  FROM corpus CROSS JOIN cent
),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
    FROM sub
  ) WHERE rn = 1
),
pc AS (
  SELECT vec_id, {code_cols} FROM codes GROUP BY vec_id
),
luts(query_id, lut) AS (VALUES
  {lut_rows}
),
scored AS (
  SELECT q.query_id, pc.vec_id, round({adc}, 6) AS adc_dist
  FROM pc CROSS JOIN luts q
)
SELECT query_id, vec_id, adc_dist, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
  FROM scored
) WHERE rank <= {int(k_top)}
"""

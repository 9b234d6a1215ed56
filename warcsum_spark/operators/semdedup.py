"""T54 — SemDedup: semantic deduplication via k-means clustering of
document embeddings followed by within-cluster cosine pruning (Abbas et
al. 2023, "SemDedup: Data-efficient learning at web-scale through
semantic deduplication"). Exact/near lexical dedup (T1) misses
paraphrases and re-renderings of the same content; SemDedup catches
them by working in embedding space — but a corpus-wide pairwise cosine
is O(N²), so the algorithm's whole point is to confine the quadratic to
k-means clusters and never compare across clusters.

Plan shape at 100 TB:

* the coarse quantizer is a MODEL trained on a bounded sample
  (``train_ivf_centroids``, shared with IVF-ANN — reads ≤ train_size
  rows, never the corpus);
* cluster assignment + centroid similarity is ONE Arrow-batched kernel
  pass (batch matmul against the broadcast [k, dim] centroid matrix) —
  no shuffle, no join;
* the only exchange is the hash partition on ``centroid_id`` feeding
  ``applyInPandas`` — each cluster is processed in one vectorized
  kernel whose pairwise matmul is blocked (O(block·|cluster|) memory),
  and cluster size is bounded by construction: SemDedup scales k with N
  (the paper uses N/k ≈ 10⁴), so per-group state never grows with the
  corpus;
* document text/embeddings never self-join — candidate generation IS
  the cluster assignment.

Keep rule (paper §2: among semantic duplicates, keep the example with
the LOWEST cosine similarity to its cluster centroid — the least
prototypical, preserving diversity): rows are ranked within a cluster
by (centroid_sim asc, id asc) and a row is a duplicate iff some
higher-priority row in the same cluster has cosine ≥ threshold with it.
This "exists earlier neighbor" form is deterministic, engine-portable
(a DuckDB twin runs it as a rank-inequality join — the gate's oracle is
blind to the blocked kernel), and order-insensitive to partitioning.

Similarities are computed in float64 and rounded half-away-from-zero to
6 decimals BEFORE the threshold test and the priority ordering, on both
engines, so the dup/keep decision never hinges on summation-order
epsilons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warcsum_spark.operators.similarity import _list_to_flat


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero to 6 decimals — the rounding both Spark's
    ``F.round`` (BigDecimal HALF_UP) and DuckDB's ``round()`` apply;
    numpy's own ``np.round`` is half-even and would diverge on .5s."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _assign_sim_udf(centroids: np.ndarray):
    """embedding → struct(centroid_id, centroid_sim): nearest centroid
    (ties → lowest id, via stable argsort) and the cosine to it.
    Centroids are unit-norm [k, dim] float64 riding the closure — a few
    KB broadcast with the task, one batch matmul per Arrow batch."""
    Ct = centroids.T  # [dim, k]

    @F.arrow_udf("centroid_id int, centroid_sim double")
    def assign(vecs: pa.Array) -> pa.Array:
        flat, starts, lens = _list_to_flat(vecs)
        n = len(lens)
        if n == 0:
            return pa.array(
                [],
                type=pa.struct(
                    [("centroid_id", pa.int32()), ("centroid_sim", pa.float64())]
                ),
            )
        dim = Ct.shape[0]
        if not np.all(lens == dim):
            raise ValueError("semdedup: embedding dim != centroid dim")
        V = flat.reshape(n, dim)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = V @ Ct
        # stable argsort desc → deterministic lowest-centroid-id tiebreak
        best = np.argsort(-sims, axis=1, kind="stable")[:, 0].astype(np.int32)
        best_sim = sims[np.arange(n), best]
        return pa.StructArray.from_arrays(
            [pa.array(best), pa.array(best_sim)],
            names=["centroid_id", "centroid_sim"],
        )

    # §4.4 fence: without it the struct-field projection collapse +
    # the groupBy's pushed isnotnull re-ran the assignment matmul 3x
    return assign.asNondeterministic()


def _cluster_dedup(threshold: float, block: int = 1024):
    """Per-cluster pandas kernel: rank by (centroid_sim, id), then mark
    row i a duplicate iff any higher-priority row j has cosine ≥
    threshold. The pairwise matmul runs in row blocks against the
    growing prefix — O(block · |cluster|) memory, never |cluster|²."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (pdf["vec_id"].to_numpy(), pdf["centroid_sim"].to_numpy())
        )
        pdf = pdf.iloc[order].reset_index(drop=True)
        n = len(pdf)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        dup = np.zeros(n, dtype=bool)
        for s in range(1, n, block):
            e = min(s + block, n)
            S = _round6(V[s:e] @ V[:e].T)  # rows s..e vs all rows < e
            # strictly-lower-triangular mask: row i compares to j < i only
            cols = np.arange(e)
            mask = cols[None, :] < np.arange(s, e)[:, None]
            dup[s:e] = ((S >= threshold) & mask).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "centroid_id": pdf["centroid_id"],
                "centroid_sim": pdf["centroid_sim"],
                "is_dup": dup,
            }
        )

    return fn


def semdedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
) -> DataFrame:
    """(vec_id, centroid_id, centroid_sim, is_dup) — SemDedup over an
    embedding corpus given a trained unit-norm centroid matrix (use
    ``train_ivf_centroids``). ``is_dup`` rows are the ones a training
    run drops; survivors = ``filter(~is_dup)``."""
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        _assign_sim_udf(centroids)(F.col(vec_col)).alias("_a"),
    ).select(
        "vec_id",
        "_vec",
        F.col("_a.centroid_id").alias("centroid_id"),
        F.round(F.col("_a.centroid_sim"), 6).alias("centroid_sim"),
    )
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("centroid_sim", T.DoubleType()),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )
    return assigned.groupBy("centroid_id").applyInPandas(
        _cluster_dedup(threshold, block), schema=out_schema
    )

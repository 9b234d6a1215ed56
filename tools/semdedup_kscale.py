"""Paired-run evidence for SemDedup's k∝N scaling on a scaled tier.

SemDedup's intra-cluster pairwise work is O(N²/k); holding k constant
while N grows makes per-row cost grow ~linearly, while the paper's
production configuration (Abbas et al. 2023, §3: cluster count grows
with corpus size, N/k constant) keeps it flat. This script measures an
explicit k against the same scaled input and session config as the
suite tier, so its number is directly comparable to the tier table.

History: the bench query originally pinned n_centroids=8 at every tier
(the ×300 table's one falling ratio); this script's paired run — 423.0 s
pinned vs 150.8 s at k=2400 on the ×300 input — was the evidence that
led to folding the k∝N rule into q_semdedup_docs itself
(`__spark_entry__._semdedup_k`: max(8, min(1024, N//256)), identical to
k=8 at every correctness-gate scale so the DuckDB oracle still
regenerates bit-identical centroids at sf0.01). It remains useful for
measuring non-default k choices on any tier.

Usage: python tools/semdedup_kscale.py [scaled_dir] [k]
Prints one JSON line; does not touch the suite artifacts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from warcsum_spark.session import get_spark  # noqa: E402
from warcsum_spark.operators.semdedup import semdedup  # noqa: E402
from warcsum_spark.operators.similarity import train_ivf_centroids  # noqa: E402


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warcsum_scale_x300"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    spark = get_spark(cores=16, shuffle_partitions=64, app_name="semdedup_kscale")
    emb = spark.read.parquet(os.path.join(scaled, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n = emb.count()
    # same near-dup injection as q_semdedup_docs (__spark_entry__.py)
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), F.col("embedding")
    )
    perturbed = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(0.2)).otherwise(x)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies).unionByName(perturbed)
    t0 = time.monotonic()
    # train_size 10×k keeps the bounded-collect training sample at
    # 24k rows × 64 dims ≈ 12 MB — same IVF practice as the ANN path
    C = train_ivf_centroids(emb, n_centroids=k, train_size=10 * k, seed=42)
    out = semdedup(corpus, C, threshold=0.95)
    n_dup = out.filter(F.col("is_dup")).count()
    sec = round(time.monotonic() - t0, 3)
    print(
        json.dumps(
            {
                "scaled_dir": scaled,
                "rows": n,
                "k": k,
                "sec": sec,
                "rows_per_sec": round(n / sec, 1),
                "n_dup": n_dup,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

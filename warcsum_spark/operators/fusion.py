"""T91 — reciprocal-rank fusion of retrieval runs (Cormack, Clarke &
Büttcher, SIGIR 2009: ``rrf(d) = Σ_runs 1/(k0 + rank_run(d))`` with
k0 = 60).

Why the engine wants it: the repo already has the two halves of hybrid
retrieval — lexical BM25 (T69) and dense cosine ANN (T2) — and RRF is
the standard, score-scale-free way to combine them (it only consumes
RANKS, so BM25's unbounded scores and cosine's [−1,1] never need
calibrating against each other). Hybrid BM25+dense with RRF is the
default retrieval stack in modern search systems and the
candidate-generation step for retrieval-based decontamination and
hard-negative mining over a training corpus.

Pinned, engine-portable semantics:

* inputs: N ranked runs, each (query_id, doc_id, rank) with ranks
  1..k_run per query (the bm25_search / brute_force_topk output
  contract; any doc absent from a run contributes nothing for it);
* ``rrf_score = term_1 + term_2 + …`` where
  ``term_i = coalesce(1.0 / (k0 + rank_i), 0.0)`` — evaluated as a
  FIXED left-to-right two-operand chain in run-list order, never a
  cross-row aggregate, so the float addition order is pinned by the
  expression tree and both engines emit bit-identical doubles;
  rounded to 6 at output;
* ``fused_rank``: row_number per query over (rrf_score DESC, doc_id
  ASC) — computed on the ROUNDED score (the bm25.py determinism
  precedent), truncated to the top ``k``.

Plan shape at 100 TB: the inputs are top-k-per-query runs — dimension
tables by construction (|queries|·k rows), NOT corpus-sized; all the
heavy lifting (corpus scans, salted top-k, broadcast query sets) lives
inside the upstream retrieval operators, which are already
scale-shaped. Fusion itself is N−1 full-outer joins + one per-query
rank window over ≤ N·k rows per query. Zero Python, zero corpus
exchanges.

No reference counterpart (warcsum has no retrieval); the formula is
the published three-line wonder.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K0 = 60


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    k0: int = K0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, rank_1..rank_N, rrf_score, fused_rank) —
    fuse N ranked runs; see module docstring for the pinned float
    discipline. ``runs[i]`` must expose (query_id, <some id col>,
    rank); the first two non-rank/score columns are taken as
    (query_id, id)."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    slim = []
    for i, r in enumerate(runs, start=1):
        ids = [c for c in r.columns if c not in ("rank", "score")]
        qid, did = ids[0], ids[1]
        slim.append(
            r.select(
                F.col(qid).alias("query_id"),
                F.col(did).alias(id_col),
                F.col("rank").alias(f"rank_{i}"),
            )
        )
    fused = reduce(
        lambda a, b: a.join(b, ["query_id", id_col], "full_outer"), slim
    )
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k0) + F.col("rank_1")).cast("double"),
        F.lit(0.0),
    )
    for i in range(2, len(slim) + 1):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"rank_{i}")).cast("double"),
            F.lit(0.0),
        )
    fused = fused.withColumn("rrf_score", F.round(score, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            id_col,
            *[f"rank_{i}" for i in range(1, len(slim) + 1)],
            "rrf_score",
            "fused_rank",
        )
    )


def rrf_sql(
    runs: list[tuple[str, str]],
    k: int = 10,
    k0: int = K0,
    id_col: str = "doc_id",
) -> str:
    """The IDENTICAL pinned fusion for DuckDB. ``runs[i]`` is
    ``(subquery, run_id_col)`` — a complete SELECT (may carry its own
    WITH) producing (query_id, <run_id_col>, …, rank) — mirror of the
    DataFrame contract."""
    ctes = []
    for i, (sub, rid) in enumerate(runs, start=1):
        ctes.append(
            f"run_{i} AS (SELECT query_id, {rid} AS {id_col},"
            f" rank AS rank_{i} FROM ({sub}))"
        )
    run_subqueries = runs
    join = "run_1"  # joins are left-associative; USING coalesces keys
    for i in range(2, len(run_subqueries) + 1):
        join = f"{join} FULL OUTER JOIN run_{i} USING (query_id, {id_col})"
    terms = [
        f"coalesce(1.0 / CAST({k0} + rank_{i} AS DOUBLE), 0.0)"
        for i in range(1, len(run_subqueries) + 1)
    ]
    score = terms[0]
    for t in terms[1:]:
        score = f"({score} + {t})"
    ranks = ", ".join(
        f"rank_{i}" for i in range(1, len(run_subqueries) + 1)
    )
    return f"""
WITH {', '.join(ctes)},
fused AS (
  SELECT query_id, {id_col}, {ranks}, round({score}, 6) AS rrf_score
  FROM {join}
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, {id_col} ASC
  ) AS fused_rank
  FROM fused
)
SELECT query_id, {id_col}, {ranks}, rrf_score,
       CAST(fused_rank AS INT) AS fused_rank
FROM ranked WHERE fused_rank <= {k}
"""

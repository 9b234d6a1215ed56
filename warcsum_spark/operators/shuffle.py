"""T60 — deterministic corpus shuffle: a seeded pseudorandom
permutation of the corpus realized WITHOUT a global sort. Training
pipelines must shuffle the packed corpus (epoch order ≠ crawl order —
adjacent documents share hosts/topics and correlate gradients), and
the order has to be reproducible from a seed for resumable/repeatable
runs. A naive ``ORDER BY rand()`` is a full-corpus total sort AND
non-reproducible; this is the two-level form every sharded training
loader actually consumes.

Plan shape at 100 TB: key = md5(seed:id) (pure JVM, engine-portable —
the sampling.py bucket discipline); shard = first-byte bucket mod
n_shards; position within shard = row_number over the shard partition
ordered by (key, id) — ONE hash exchange + per-shard local sort, no
global exchange-to-one. The global position adds a shard-offset table:
shard sizes are a dimension-sized aggregate (≤ n_shards rows), their
running sum a window on that dimension only, broadcast back. Global
training order = sort by (shard, pos) lazily at read time — i.e. never
materialized as a total order at all: loaders read shards in shard_id
order and rows in pos order within each.

Engine-exact: md5 hex strings order lexicographically == numerically,
so the permutation is a pure function of (seed, id) reproducible by
any engine with md5 — the DuckDB oracle recomputes it with the same
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.functions.sampling import bucket_sql


def _permutation_positions(
    docs: DataFrame,
    n_shards: int,
    seed: int,
    id_col: str,
    carry: list = (),
) -> DataFrame:
    """(doc_id, shard_id, pos [, carry...]) — the seeded two-level
    permutation core. ``carry`` columns ride the ONE permutation
    exchange so downstream consumers (sequence packing) never pay a
    second corpus-keyed join to re-attach their per-doc values."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        key.alias("_key"),
        (bucket % n_shards).alias("shard_id"),
        *carry,
    )
    w = Window.partitionBy("shard_id").orderBy("_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).alias("pos"),
        *keyed.columns[3:],
    )


def permute_corpus(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard_id, pos, global_pos): a seeded permutation of the
    input — ``global_pos`` is 1..N exactly once, equal to reading
    shards in id order and rows in ``pos`` order within each."""
    pos = _permutation_positions(docs, n_shards, seed, id_col)
    sizes = pos.groupBy("shard_id").agg(F.max("pos").alias("_n"))
    offsets = sizes.select(
        "shard_id",
        (
            F.sum("_n").over(
                Window.orderBy("shard_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna(0, subset=["_off"])
    return pos.join(F.broadcast(offsets), "shard_id").select(
        "doc_id",
        "shard_id",
        "pos",
        (F.col("_off") + F.col("pos")).alias("global_pos"),
    )


def permute_oracle_sql(
    docs_table: str = "documents",
    n_shards: int = 8,
    seed: int = 42,
    id_col: str = "doc_id",
) -> str:
    """The same permutation in DuckDB SQL (same md5 key, same first-byte
    bucket via the sampling.py strpos arithmetic, same windows)."""
    key = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    return f"""
WITH keyed AS (
  SELECT {id_col} AS doc_id, {key} AS k,
         ({bucket_sql(id_col, seed)}) % {n_shards} AS shard_id
  FROM {docs_table}
),
pos AS (
  SELECT doc_id, shard_id,
         CAST(row_number() OVER (PARTITION BY shard_id ORDER BY k, doc_id) AS INT) AS pos
  FROM keyed
),
offs AS (
  SELECT shard_id,
         coalesce(sum(n) OVER (ORDER BY shard_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT shard_id, max(pos) AS n FROM pos GROUP BY shard_id)
)
SELECT p.doc_id, p.shard_id, p.pos,
       CAST(p.pos + o.off AS BIGINT) AS global_pos
FROM pos p JOIN offs o USING (shard_id)
"""

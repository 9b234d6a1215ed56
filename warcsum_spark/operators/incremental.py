"""T62 — incremental cross-batch MinHash dedup: dedup an incoming
crawl batch against the PERSISTED signature index of everything already
ingested, without re-reading (or re-hashing) the existing corpus. This
is how production dedup actually runs — T1's minhash_lsh_duplicates is
the within-corpus batch job; day-to-day operation is "yesterday's index
+ today's batch": signatures are stored once (they are ~100 B/doc
versus KBs of text — the index for 10^10 docs fits in a few TB of
parquet), each new batch is hashed once, matched against the index, and
the survivors' signatures are appended.

Plan shape at 100 TB: the index side streams ONLY its band table
(doc_id, band_id, band_hash — 24 B rows) out of parquet; the new
batch's bands are typically orders of magnitude smaller and are
BROADCAST to the index scan, so the index is never shuffled at all.
Estimates re-attach signatures once per side (cand pairs ≪ corpus).
Index maintenance is an anti-join + union — append-only parquet in
practice.

Correctness: the kernel, banding, and estimate are the SAME code as
minhash_signatures (T1, hash-certified at the gate); what this adds —
and what the gate checks — is the batch-vs-index candidate join and
the id plumbing around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import minhash_signatures


def _band_stream(sigs: DataFrame, id_alias: str) -> DataFrame:
    return sigs.select(
        F.col("doc_id").alias(id_alias),
        F.posexplode("bands").alias("band_id", "band_hash"),
    )


def cross_batch_duplicates(
    new_docs: DataFrame,
    index_sigs: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_new: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (dups, new_sigs): ``dups`` = (new_id, index_id, n_bands,
    est_jaccard) for every new-batch doc whose estimated Jaccard against
    an indexed doc reaches ``threshold``; ``new_sigs`` = the new batch's
    (doc_id, sig, bands) for survivor appends. ``index_sigs`` must carry
    (doc_id, sig, bands) as produced by
    ``minhash_signatures(with_bands=True)`` — the persisted index."""
    new_sigs = minhash_signatures(
        new_docs,
        k=k,
        num_hashes=num_hashes,
        id_col=id_col,
        text_col=text_col,
        with_bands=True,
        bands=bands,
    ).cache()
    nb = _band_stream(new_sigs, "new_id")
    ib = _band_stream(index_sigs, "index_id")
    if broadcast_new:
        nb = F.broadcast(nb)
    cand = (
        ib.join(nb, ["band_id", "band_hash"])
        .groupBy("new_id", "index_id")
        .agg(F.count("*").alias("n_bands"))
    )
    sa = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("_sa"))
    sb = index_sigs.select(
        F.col("doc_id").alias("index_id"), F.col("sig").alias("_sb")
    )
    est = F.round(
        F.aggregate(
            F.zip_with(
                "_sa", "_sb", lambda x, y: (x == y).cast("int")
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(num_hashes)),
        6,
    )
    dups = (
        cand.join(F.broadcast(sa) if broadcast_new else sa, "new_id")
        .join(sb, "index_id")
        .select("new_id", "index_id", "n_bands", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    return dups, new_sigs


def merge_index(
    index_sigs: DataFrame, new_sigs: DataFrame, dups: DataFrame
) -> DataFrame:
    """The next index: existing signatures plus the new batch's
    NON-duplicate signatures (a duplicate's content is already
    represented — appending it would double-count every future match)."""
    survivors = new_sigs.join(
        dups.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    return index_sigs.unionByName(survivors)

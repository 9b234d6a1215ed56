"""Duplicated token-span detection and removal (exact substring dedup).

The pass Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better") call ExactSubstr: any token n-gram that occurs more than
once ANYWHERE in the corpus (across documents or repeated within one) is
a duplicated span, and every token covered by at least one duplicated
n-gram is removed from the rebuilt document. The reference tool does
this with a corpus-wide suffix array on one machine; here the same
semantics decompose relationally, so Catalyst/AQE handle distribution:

1. tokenize + position-stamped gram keys per document — **row-local**
   (one projection, no shuffle; the gram key is a chained ``xxhash64``
   built by ``zip_with`` over shifted token-hash slices, the same
   Catalyst-trap-safe construction as minhash's `_shingle_hash_array`:
   every lambda touches only bound elements, so the tokenizer is
   evaluated once per row, not once per gram);
2. duplicated-gram detection = ``groupBy(gram_key).count() >= 2`` —
   ONE slim exchange carrying (8-byte key, partial count) with map-side
   combine;
3. hit positions = grams ⋈ duplicated keys — hash join on the 8-byte
   key (never all-pairs; the duplicated-key side is corpus-dependent, so
   it stays a shuffle join rather than a broadcast);
4. per-document covered-token sets — ONE doc-grain exchange carrying
   (doc_id, int position) pairs only, never text;
5. rebuild — row-local: expand hit positions to covered token indices
   with ``sequence``/``flatten``, drop covered tokens with an indexed
   ``filter``, re-join with single spaces.

At 100 TB the only data-sized exchanges are (2) and (4), both slim
(8–16 byte rows); document text is never shuffled — the rebuild joins
doc-grain hit lists back to the original scan partition by doc_id.

Key-width trade (documented, same stance as MinHash): the default
``key="hash"`` accepts 64-bit gram-key collisions (probability ~n²/2⁶⁵;
at 10¹² corpus grams ≈ 3%-of-one-false-span) in exchange for 8-byte
shuffle rows. ``key="text"`` keys on the gram string itself — exact,
DuckDB-mirrorable, ~6× wider shuffle rows.

``mode="all"`` removes every occurrence of a duplicated span (the
reference tool's behavior); ``mode="keep_first"`` retains the globally
first occurrence (by (doc_id, position)) of each duplicated gram, which
keeps one canonical copy of boilerplate in the corpus — the variant
most training pipelines actually want. keep_first replaces the count
aggregate with a row_number window over the same gram-keyed exchange,
so the shuffle plan is identical.

Reference mapping: this generalizes warcsum's payload-digest dedup
(warcsum.c:520–558 digests whole payloads; here the "payload" is every
k-token window) — cited for parity, no code shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_key_array(toks, k: int, key: str):
    """Row-local column expr: gram keys of a pre-split token array.

    hash: chained xxhash64 over the k token hashes (8-byte keys).
    text: the k tokens joined with single spaces (exact keys).
    Every lambda binds only its own elements — `toks` appears in
    argument positions only, so upstream expressions evaluate once per
    row (see _shingle_hash_array's Catalyst-trap note in dedup.py).
    """
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    if key == "hash":
        th = F.transform(toks, lambda t: F.xxhash64(t))
        acc = F.slice(th, 1, m)
        for j in range(2, k + 1):
            acc = F.zip_with(acc, F.slice(th, j, m), lambda x, y: F.xxhash64(x, y))
    elif key == "text":
        acc = F.slice(toks, 1, m)
        for j in range(2, k + 1):
            acc = F.zip_with(
                acc, F.slice(toks, j, m), lambda x, y: F.concat_ws(" ", x, y)
            )
    else:
        raise ValueError(f"key must be 'hash' or 'text', got {key!r}")
    return acc


def dedup_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    mode: str = "all",
    key: str = "hash",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every token covered by a duplicated k-token span.

    Returns (doc_id, clean_text, n_tokens, n_removed) — one row per
    input document, including documents removed in full (clean_text '')
    and documents shorter than k tokens (nothing to match, unchanged).
    Rebuilt text is single-space joined: tokenization is ``\\s+`` on the
    trimmed text, so original whitespace runs are not preserved — the
    same convention every text operator in this repo uses.
    """
    if mode not in ("all", "keep_first"):
        raise ValueError(f"mode must be 'all' or 'keep_first', got {mode!r}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")

    toks_expr = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(F.col(id_col).alias("doc_id"), toks_expr.alias("toks"))

    grams = base.select(
        "doc_id", F.posexplode(_gram_key_array(F.col("toks"), k, key)).alias("pos", "gk")
    )

    if mode == "all":
        dup = grams.groupBy("gk").count().filter(F.col("count") >= min_count)
        hits = grams.join(dup.select("gk"), "gk").select("doc_id", "pos")
    else:
        # rank every occurrence of each gram globally; occurrences past
        # the first of a duplicated gram are the spans to remove. Same
        # gram-keyed exchange as the aggregate — the window subsumes it.
        w = Window.partitionBy("gk").orderBy("doc_id", "pos")
        ranked = grams.select(
            "doc_id",
            "pos",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("gk")).alias("cnt"),
        )
        hits = ranked.filter(
            (F.col("cnt") >= min_count) & (F.col("rn") > 1)
        ).select("doc_id", "pos")

    dpos = hits.groupBy("doc_id").agg(F.collect_set("pos").alias("dpos"))

    cov = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("dpos"), F.array().cast("array<int>")),
                lambda p: F.sequence(p, p + F.lit(k - 1)),
            )
        )
    )
    joined = base.join(dpos, "doc_id", "left").select(
        "doc_id", "toks", cov.alias("cov")
    )
    kept = F.filter(
        F.col("toks"), lambda t, i: ~F.array_contains(F.col("cov"), i)
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
    )

"""Prefix-filtered exact set-similarity self-join (VernicaJoin / PPJoin).

The EXACT all-pairs Jaccard join that scales: `ngram_jaccard_pairs`
(operators/dedup.py) joins on EVERY shared shingle, which degenerates
quadratically the moment a common shingle exists ("the of the" appears
in every English page). The prefix-filtering principle (Chaudhuri,
Ganti & Kaushik ICDE'06; distributed as VernicaJoin, Vernica, Carey &
Li SIGMOD'10; PPJoin, Xiao et al. WWW'08) makes the join exact AND
sub-quadratic: order every document's shingle set by one GLOBAL total
order (ascending corpus frequency, ties by hash value), and keep only
each document's first

    L = |S| - ceil(t * |S|) + 1

shingles — its *prefix*. Any pair with Jaccard >= t must share at least
one prefix shingle (if all >= ceil(t*|S|) intersection elements avoided
the prefix they would overflow the ceil(t*|S|)-1 suffix slots), so
joining on prefix shingles alone finds every qualifying pair; exact
verification then removes false candidates. Rarest-first ordering makes
prefixes maximally selective — stopword-grade shingles never generate
candidates.

Spark decomposition (all stages declarative, AQE re-plans skew):

1. per-doc distinct shingle-hash arrays — row-local (the same chained
   xxhash64 construction as minhash, `_shingle_hash_array`);
2. global shingle frequency — ONE slim (8-byte key, count) exchange
   with map-side combine;
3. per-doc rarity rank + prefix truncation — shingles ⋈ freq
   (gram-keyed) then ONE doc-keyed window;
4. candidate pairs — self-join ON PREFIX SHINGLES ONLY, with the
   size-ratio prune (J >= t forces min(|A|,|B|) >= t*max(|A|,|B|))
   applied inside the join condition, then pair-distinct (slim);
5. exact verify — candidates ⋈ the doc→shingle-array table twice
   (hash joins on doc_id), intersection via row-local
   ``array_intersect``; Jaccard filtered >= t.

Shuffle ledger at 100 TB: (2) and (4) carry 8–16 byte rows; (3) carries
(doc_id, shingle, freq) for prefix selection; (5) carries each
candidate document's shingle-hash array exactly twice. Document TEXT is
never shuffled anywhere. No stage is all-pairs.

Same 64-bit-collision stance as MinHash/T49: shingle identity is the
chained xxhash64 (8-byte shuffle keys); the driver-gate oracle computes
Jaccard over literal shingle STRINGS, so gate green doubles as a
collision check.

Float guard: prefix/size bounds use an epsilon (t*n computed in binary
can land 4e-16 ABOVE the exact integer product, and ceil would then
shorten the prefix → missed pairs). The epsilon only ever LENGTHENS a
prefix / loosens a prune, so it can never cost correctness.

Reference mapping: generalizes warccollres's equal-digest grouping
(warccollres.c:520–558 groups by exact payload digest) to graded
set-overlap — cited for parity, no code shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warcsum_spark.operators.dedup import _shingle_hash_array

_EPS = 1e-9


def _prefix_shingles(base: DataFrame, threshold: float) -> DataFrame:
    """(doc_id, n_sh, sh) restricted to each doc's rarity-ordered prefix."""
    sh = base.select("doc_id", "n_sh", F.explode("sh_set").alias("sh"))
    freq = sh.groupBy("sh").agg(F.count("*").alias("freq"))
    w = Window.partitionBy("doc_id").orderBy("freq", "sh")
    plen = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - _EPS) + 1
    return (
        sh.join(freq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "n_sh", "sh")
    )


def similarity_join(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact (doc_a < doc_b, jaccard >= threshold) pairs over distinct
    k-word shingles — identical output to `ngram_jaccard_pairs` at the
    same (k, threshold), sub-quadratic plan. jaccard is rounded to 6
    decimals, matching that operator's convention."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.sort_array(
                F.array_distinct(_shingle_hash_array(text_col, k))
            ).alias("sh_set"),
        )
        .withColumn("n_sh", F.size("sh_set"))
        .filter(F.col("n_sh") > 0)
    )
    # the doc→set table feeds prefix selection AND both verify sides
    base = base.cache()

    # cached: both self-join sides consume the prefix table — the
    # freq-join + rarity window otherwise runs once per side
    pre = _prefix_shingles(base, threshold).cache()
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio prune: J >= t ⟹ min sizes within factor t
            & (
                F.least("a.n_sh", "b.n_sh")
                >= F.lit(threshold) * F.greatest("a.n_sh", "b.n_sh") - _EPS
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    va = base.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"),
                     F.col("n_sh").alias("na"))
    vb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"),
                     F.col("n_sh").alias("nb"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jacc = inter / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        # exact final cut — same unrounded-ratio comparison as
        # ngram_jaccard_pairs / the oracle SQL (no epsilon here: all three
        # engines evaluate the identical double division)
        .filter(jacc >= threshold)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


def containment_join(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directed near-containment pairs: (doc_a, doc_b, containment)
    with containment = |A∩B| / |A| >= threshold and doc_a != doc_b —
    "A is (mostly) quoted inside B". The asymmetric twin of
    `similarity_join`: quote inclusion, boilerplate-inside-page, and
    subset duplication that Jaccard misses when |B| >> |A| (a tweet
    fully contained in a news page has Jaccard ~0 but containment 1).

    Prefix filtering applies on the PROBE side only: C(A,B) >= t needs
    |A∩B| >= ceil(t*|A|), so A's rarity-ordered prefix of length
    |A| - ceil(t*|A|) + 1 must hit the intersection — but B gets no
    size-relative bound (any huge B can contain a small A), so the
    index side carries ALL its shingles. That is an inverted index:
    linear in the corpus, never all-pairs; candidate fan-out per probe
    shingle is that shingle's document frequency, and probe prefixes
    are rarest-first, so stopword-grade shingles never probe. Exact
    array_intersect verification removes false candidates, as in
    similarity_join. No size-ratio prune exists for containment — by
    design it crosses size classes.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.sort_array(
                F.array_distinct(_shingle_hash_array(text_col, k))
            ).alias("sh_set"),
        )
        .withColumn("n_sh", F.size("sh_set"))
        .filter(F.col("n_sh") > 0)
    )
    base = base.cache()

    probe = _prefix_shingles(base, threshold).select(
        F.col("doc_id").alias("doc_a"), "sh"
    )
    index = base.select(
        F.col("doc_id").alias("doc_b"), F.explode("sh_set").alias("sh")
    )
    cand = (
        probe.join(index, "sh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    va = base.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"),
                     F.col("n_sh").alias("na"))
    vb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    cont = F.size(F.array_intersect("set_a", "set_b")) / F.col("na")
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .filter(cont >= threshold)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )

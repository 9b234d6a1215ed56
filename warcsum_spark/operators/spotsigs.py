"""T124 — SpotSigs near-duplicate detection (Theobald, Siddharth &
Paepcke, "SpotSigs: robust and efficient near duplicate detection in
large web crawls", SIGIR 2008 — the boilerplate-blind dedup: spot
signatures anchor on STOPWORD ANTECEDENTS, which occur in natural
prose but almost never inside navigation bars, ads, or footers, so
the signature set samples exactly the article body that shingling
(T1) dilutes with chrome. Each occurrence of an antecedent
contributes one signature: the antecedent plus the chain of the next
``chain_len`` non-antecedent tokens; documents are compared by exact
multiset Jaccard over their signature bags with the paper's
length-ratio upper bound as the pruning filter).

Pinned, engine-portable definitions:

* tokens: the shared ASCII-whitespace corpus contract —
  lower(trim(text)) split on WS_CLASS+, empty tokens dropped;
* antecedents: an explicit lowercase list (default: the paper's
  stopword-style anchors); a token IS an antecedent iff exact match;
* one signature per antecedent OCCURRENCE at 1-based position i:
  ``ant || ':' || join(chain, '-')`` where chain = the first
  ``chain_len`` elements of [t for t in toks[i+1:] if t not an
  antecedent]; occurrences whose chain would be EMPTY yield nothing
  (document tail);  duplicate signatures are KEPT — the bag is a
  multiset (the paper's cardinalities |A| count occurrences);
* candidate pairs: docs sharing ≥ 1 signature (doc_a < doc_b),
  pruned by the paper's upper bound — multiset Jaccard ≤
  min(|A|,|B|)/max(|A|,|B|), so pairs with
  ``min·den < num·max`` cannot reach τ = num/den and are dropped
  BEFORE the verify join (exact integer comparison);
* verify: inter = Σ_sig min(cnt_a, cnt_b); union = |A|+|B|−inter;
  ``is_dup = inter·den ≥ num·union`` decided on EXACT integers;
  ``sim = round(inter/union, 6)`` is the one IEEE division, emitted
  for humans after the flag is already decided.

Plan shape at 100 TB: signature extraction is ROW-LOCAL (one nested
higher-order-function expression over the token array — no
posexplode carrying the array through a Generate, the 2c9cd06
lesson); the only corpus-grain exchanges carry (doc_id, sig, cnt)
triples — text never shuffles. Candidate generation is the
signature-keyed self-join (each shared signature proposes its pair
once via DISTINCT), bounded by the antecedent sampling exactly as
the paper argues; the length prune runs before the verify join. At
web scale the hot-signature tail is handled the same way T50 bounds
its prefix buckets (rarity ordering / hot-bucket cap documented
there); the gate corpus needs no cap and the exact form IS the
oracle.

No reference counterpart (warcsum digests whole payloads; this is
content-aware near-dup). §2.12 dedup family, sibling of
T1/T16/T118/T123.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import WS_CLASS

#: the paper's stopword-antecedent flavor: articles / be / have / do
#: + a few high-frequency prose anchors, lowercase exact-match
DEFAULT_ANTECEDENTS = (
    "a", "an", "the", "is", "are", "was", "were", "do", "does",
    "has", "have", "had", "it", "there", "said", "that",
)


def _sig_array_expr(ants_sql: str, chain_len: int) -> str:
    """Row-local signature-bag expression over a ``toks`` array column
    (Spark SQL higher-order functions; no Generate, no Python)."""
    return f"""
transform(
  filter(
    transform(sequence(1, size(toks)), i ->
      struct(element_at(toks, i) AS ant,
             CASE WHEN array_contains({ants_sql}, element_at(toks, i))
                  THEN slice(
                         filter(slice(toks, i + 1,
                                      greatest(size(toks) - i, 0)),
                                t -> NOT array_contains({ants_sql}, t)),
                         1, {int(chain_len)})
             END AS chain)),
    p -> p.chain IS NOT NULL AND size(p.chain) > 0),
  p -> concat(p.ant, ':', array_join(p.chain, '-')))
"""


def spotsig_bags(
    docs: DataFrame,
    antecedents: tuple[str, ...] = DEFAULT_ANTECEDENTS,
    chain_len: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig, cnt) — the per-document spot-signature multiset,
    plus each document's bag size is ``sum(cnt) over doc``s downstream."""
    if chain_len < 1:
        raise ValueError(f"chain_len must be ≥ 1, got {chain_len}")
    if not antecedents:
        raise ValueError("antecedents must be non-empty")
    ants_sql = (
        "array(" + ", ".join("'" + a.replace("'", "''") + "'"
                             for a in antecedents) + ")"
    )
    nrm = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            WS_CLASS + "+", " ",
        ),
        "^ | $", "",
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(nrm, " ").alias("toks")
    ).filter((F.size("toks") > 0) & (F.col("toks") != F.array(F.lit(""))))
    sigs = toks.select(
        "doc_id",
        F.explode(
            F.expr(_sig_array_expr(ants_sql, chain_len))
        ).alias("sig"),
    )
    return sigs.groupBy("doc_id", "sig").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def spotsig_duplicates(
    docs: DataFrame,
    antecedents: tuple[str, ...] = DEFAULT_ANTECEDENTS,
    chain_len: int = 2,
    tau_num: int = 44,
    tau_den: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, size_a, size_b, inter, sim, is_dup) for every
    candidate pair surviving the paper's length-ratio prune; see the
    module docstring for the pinned definitions."""
    if tau_num < 0 or tau_den < 1:
        raise ValueError(f"invalid tau fraction {tau_num}/{tau_den}")
    bags = spotsig_bags(
        docs, antecedents, chain_len, id_col=id_col, text_col=text_col
    )
    # one slim (doc, sig, cnt) table feeds sizes, candidates and verify
    bags = bags.localCheckpoint(eager=False)
    sizes = bags.groupBy("doc_id").agg(F.sum("cnt").alias("size"))

    a = bags.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig"),
        F.col("cnt").alias("cnt_a"),
    )
    b = bags.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig"),
        F.col("cnt").alias("cnt_b"),
    )
    inter = (
        a.join(b, "sig")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("cnt_a", "cnt_b")).alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("size").alias("size_b")
    )
    num, den = int(tau_num), int(tau_den)
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        # paper's prune: J ≤ min/max, so min·den < num·max can't reach τ
        .filter(
            F.least("size_a", "size_b") * F.lit(den)
            >= F.lit(num) * F.greatest("size_a", "size_b")
        )
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return out.select(
        "doc_a",
        "doc_b",
        "size_a",
        "size_b",
        "inter",
        F.round(F.col("inter").cast("double") / union.cast("double"), 6)
        .alias("sim"),
        (F.col("inter") * F.lit(den) >= F.lit(num) * union).alias("is_dup"),
    )


def spotsigs_oracle_sql(
    docs_sql: str,
    antecedents: tuple[str, ...] = DEFAULT_ANTECEDENTS,
    chain_len: int = 2,
    tau_num: int = 44,
    tau_den: int = 100,
) -> str:
    """The identical pinned pipeline in DuckDB over ``docs_sql`` (a
    SELECT yielding doc_id, text)."""
    ants = (
        "[" + ", ".join("'" + a.replace("'", "''") + "'"
                        for a in antecedents) + "]"
    )
    c = int(chain_len)
    num, den = int(tau_num), int(tau_den)
    return f"""
WITH base AS ({docs_sql}),
toks AS (
  SELECT doc_id,
         string_split(
           trim(regexp_replace(lower(coalesce(text, '')),
                               '{WS_CLASS}+', ' ', 'g')), ' ') AS toks
  FROM base
),
bags AS (
  SELECT doc_id, sig, count(*)::BIGINT AS cnt
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             list_filter(
               list_transform(range(1, len(toks) + 1), i ->
                 struct_pack(ant := toks[i],
                             chain := CASE WHEN list_contains({ants}, toks[i])
                                      THEN list_filter(toks[i+1:],
                                             t -> NOT list_contains({ants}, t)
                                           )[1:{c}]
                                      END)),
               p -> p.chain IS NOT NULL AND len(p.chain) > 0),
             p -> p.ant || ':' || array_to_string(p.chain, '-'))) AS sig
    FROM toks
    WHERE len(toks) > 0 AND toks <> ['']
  ) GROUP BY doc_id, sig
),
sizes AS (SELECT doc_id, sum(cnt)::BIGINT AS size FROM bags GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(least(a.cnt, b.cnt))::BIGINT AS inter
  FROM bags a JOIN bags b USING (sig)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, sa.size AS size_a, sb.size AS size_b, i.inter,
       round(CAST(i.inter AS DOUBLE)
             / CAST(sa.size + sb.size - i.inter AS DOUBLE), 6) AS sim,
       (i.inter * {den} >= {num} * (sa.size + sb.size - i.inter)) AS is_dup
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE least(sa.size, sb.size) * {den} >= {num} * greatest(sa.size, sb.size)
"""

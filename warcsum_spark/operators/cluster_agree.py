"""T127 — clustering-agreement metrics (Rand, Journal of the ASA
1971 for the Rand index; Hubert & Arabie, Journal of Classification
1985 for the adjusted-for-chance form; pairwise precision/recall are
the standard dedup-evaluation reading of the same contingency
counts). The dedup-calibration question the T1/T16/T54/T123/T124
family raises: given two duplicate clusterings of the same corpus —
say the byte-exact tier and an order-blind bag tier — how much does
the looser tier over-merge (pair precision) and how much does the
stricter tier miss (pair recall), and is the agreement better than
chance (ARI)? One row of exact pair-counting answers it; every
quantity below is integer arithmetic until the last pinned
divisions.

Pinned, engine-portable definitions:

* input: two labelings of the same ids — (id, label_a) is the
  REFERENCE clustering, (id, label_b) the CANDIDATE; ids present on
  only one side are dropped (inner-join semantics);
* contingency counts n_ij, row sums a_i, column sums b_j — BIGINT;
  all pair counting is carried DOUBLED so no intermediate is ever
  fractional: tp2 = Σ n_ij(n_ij−1), pa2 = Σ a_i(a_i−1),
  pb2 = Σ b_j(b_j−1), total2 = n(n−1), each an exact associative
  DECIMAL(38,0)/HUGEINT sum of even integers;
* fp2 = pb2 − tp2 (candidate merges the reference separates),
  fn2 = pa2 − tp2, tn2 = total2 − tp2 − fp2 − fn2; the emitted
  integer columns are the exact halves;
* precision = tp2/(tp2+fp2), recall = tp2/(tp2+fn2),
  f1 = 2·tp2/(2·tp2+fp2+fn2), rand = (tp2+tn2)/total2 — each ONE
  IEEE division over exact integers (zero denominator → NULL);
* ARI (Hubert–Arabie): with E2 = pa2·pb2/total2 and
  M2 = (pa2+pb2)/2 computed in that pinned order,
  ari = (tp2 − E2)/(M2 − E2); zero denominator (both clusterings
  trivial) → NULL;
* the five ratio outputs rounded to 6.

Plan shape at 100 TB: label extraction is map-only; the contingency
table is ONE map-side-combinable groupBy(label_a, label_b) exchange
(duplicate-cluster keys collapse before the shuffle — the table is
CLUSTER-grain, not corpus-grain); row/column sums re-aggregate the
contingency output, and the finale is the audited one-row broadcast
crossJoin pattern. Ids and labels shuffle once; text never does.

No reference counterpart (warcsum reports run stats, not clustering
agreement). §2.12 dedup family, the evaluation harness for
T1/T3/T48/T123/T124.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _pairs2(c: Column) -> Column:
    """x·(x−1) — DOUBLED pair count, always an exact even integer."""
    x = c.cast(_DEC)
    return x * (x - 1)


def cluster_agreement(
    ref: DataFrame,
    cand: DataFrame,
    id_col: str = "id",
    ref_label: str = "label",
    cand_label: str = "label",
) -> DataFrame:
    """ONE row: (n, tp, fp, fn, tn, precision, recall, f1, rand_index,
    ari). ``ref``/``cand`` each carry (id, label); see the module
    docstring for the pinned definitions."""
    a = ref.select(F.col(id_col).alias("id"), F.col(ref_label).alias("la"))
    b = cand.select(F.col(id_col).alias("id"), F.col(cand_label).alias("lb"))
    cont = (
        a.join(b, "id")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    cont = cont.localCheckpoint(eager=False)  # three aggregates share it

    tp = cont.agg(
        F.sum(_pairs2(F.col("nij"))).cast(_DEC).alias("tp2"),
        F.sum("nij").cast(_DEC).alias("n"),
    )
    pa = (
        cont.groupBy("la")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(_pairs2(F.col("ai"))).cast(_DEC).alias("pa2"))
    )
    pb = (
        cont.groupBy("lb")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(_pairs2(F.col("bj"))).cast(_DEC).alias("pb2"))
    )
    row = tp.crossJoin(F.broadcast(pa)).crossJoin(F.broadcast(pb))

    n = F.col("n")
    total2 = _pairs2(n)
    tp2 = F.col("tp2")
    fp2 = (F.col("pb2") - tp2).cast(_DEC)
    fn2 = (F.col("pa2") - tp2).cast(_DEC)
    tn2 = (total2 - tp2 - fp2 - fn2).cast(_DEC)

    def _ratio(num: Column, den: Column) -> Column:
        return F.when(
            den != 0, F.round(num.cast("double") / den.cast("double"), 6)
        )

    e2 = (
        F.col("pa2").cast("double")
        * F.col("pb2").cast("double")
        / total2.cast("double")
    )
    m2 = (F.col("pa2") + F.col("pb2")).cast("double") / F.lit(2.0)
    ari = F.when(
        (total2 != 0) & (m2 - e2 != 0.0),
        F.round((tp2.cast("double") - e2) / (m2 - e2), 6),
    )

    def _half(c: Column) -> Column:
        return (c / 2).cast("long")

    return row.select(
        n.cast("long").alias("n"),
        _half(tp2).alias("tp"),
        _half(fp2).alias("fp"),
        _half(fn2).alias("fn"),
        _half(tn2).alias("tn"),
        _ratio(tp2, tp2 + fp2).alias("precision"),
        _ratio(tp2, tp2 + fn2).alias("recall"),
        _ratio(tp2 * 2, tp2 * 2 + fp2 + fn2).alias("f1"),
        _ratio(tp2 + tn2, total2).alias("rand_index"),
        ari.alias("ari"),
    )


def cluster_agreement_oracle_sql(ref_sql: str, cand_sql: str) -> str:
    """The identical pinned arithmetic in DuckDB. ``ref_sql`` /
    ``cand_sql`` are SELECTs yielding (id, label)."""
    return f"""
WITH a AS (SELECT id, label AS la FROM ({ref_sql})),
b AS (SELECT id, label AS lb FROM ({cand_sql})),
cont AS (
  SELECT la, lb, count(*)::BIGINT AS nij
  FROM a JOIN b USING (id) GROUP BY la, lb
),
tp_n AS (
  SELECT sum(CAST(nij AS HUGEINT) * (CAST(nij AS HUGEINT) - 1)) AS tp2,
         CAST(sum(nij) AS HUGEINT) AS n
  FROM cont
),
pa AS (
  SELECT sum(CAST(ai AS HUGEINT) * (CAST(ai AS HUGEINT) - 1)) AS pa2
  FROM (SELECT sum(nij)::BIGINT AS ai FROM cont GROUP BY la)
),
pb AS (
  SELECT sum(CAST(bj AS HUGEINT) * (CAST(bj AS HUGEINT) - 1)) AS pb2
  FROM (SELECT sum(nij)::BIGINT AS bj FROM cont GROUP BY lb)
),
row0 AS (
  SELECT n, tp2, pa2, pb2,
         n * (n - 1) AS total2,
         pb2 - tp2 AS fp2, pa2 - tp2 AS fn2,
         n * (n - 1) - tp2 - (pb2 - tp2) - (pa2 - tp2) AS tn2
  FROM tp_n CROSS JOIN pa CROSS JOIN pb
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(tp2 // 2 AS BIGINT) AS tp,
       CAST(fp2 // 2 AS BIGINT) AS fp,
       CAST(fn2 // 2 AS BIGINT) AS fn,
       CAST(tn2 // 2 AS BIGINT) AS tn,
       CASE WHEN tp2 + fp2 <> 0 THEN
         round(CAST(tp2 AS DOUBLE) / CAST(tp2 + fp2 AS DOUBLE), 6) END
         AS precision,
       CASE WHEN tp2 + fn2 <> 0 THEN
         round(CAST(tp2 AS DOUBLE) / CAST(tp2 + fn2 AS DOUBLE), 6) END
         AS recall,
       CASE WHEN tp2 * 2 + fp2 + fn2 <> 0 THEN
         round(CAST(tp2 * 2 AS DOUBLE)
               / CAST(tp2 * 2 + fp2 + fn2 AS DOUBLE), 6) END AS f1,
       CASE WHEN total2 <> 0 THEN
         round(CAST(tp2 + tn2 AS DOUBLE) / CAST(total2 AS DOUBLE), 6) END
         AS rand_index,
       CASE WHEN total2 <> 0 AND
                 (CAST(pa2 + pb2 AS DOUBLE) / 2.0
                  - CAST(pa2 AS DOUBLE) * CAST(pb2 AS DOUBLE)
                    / CAST(total2 AS DOUBLE)) <> 0.0 THEN
         round((CAST(tp2 AS DOUBLE)
                - CAST(pa2 AS DOUBLE) * CAST(pb2 AS DOUBLE)
                  / CAST(total2 AS DOUBLE))
               / (CAST(pa2 + pb2 AS DOUBLE) / 2.0
                  - CAST(pa2 AS DOUBLE) * CAST(pb2 AS DOUBLE)
                    / CAST(total2 AS DOUBLE)), 6) END AS ari
FROM row0
"""

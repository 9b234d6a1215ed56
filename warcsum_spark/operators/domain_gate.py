"""T73 — domain-level quality gating: aggregate per-document quality
verdicts to the domain grain and gate WHOLE domains (RefinedWeb-style
"URL/domain filtering": a site whose pages are mostly junk poisons even
its individually-passing pages — template farms, parked domains, SEO
spam — while a reputable site's occasional short page is fine).

The per-document verdict is an input COLUMN, not something this
operator computes: any signal stack works (the T13 rule battery, the
T24 classifier score thresholded, T66 entropy, or a plain predicate),
which keeps the gate composable with every quality tier the engine has.

Plan shape at 100 TB:

* domain statistics = ONE exchange at the domain grain (map-side
  combine collapses the document grain early; the shuffle carries
  (domain, partial count, partial pass-count) only);
* the domain verdict table is dimension-sized → BROADCAST back;
  applying the gate is map-only on the corpus scan. No corpus-sized
  shuffle anywhere.
* ``pass_frac`` is rounded to 6 dp BEFORE the threshold compare (the
  temperature-mix / semdedup discipline) so engines agree on boundary
  domains.

Small-domain policy: domains with fewer than ``min_docs`` documents
carry too little evidence to condemn — ``default_keep`` (True by
default) decides them, mirroring how production domain lists only
blocklist domains with enough observations.

Reference anchor: no counterpart in the reference engine (its unit is
the WARC record, warcsum.c:881–1011); §2.12 training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_quality_stats(
    docs: DataFrame, pass_col: str | Column, group_col: str = "source"
) -> DataFrame:
    """(group_col, domain_n_docs, domain_pass_frac) — one domain-keyed
    aggregate; null verdicts count as failures (no evidence ≠ pass)."""
    p = F.col(pass_col) if isinstance(pass_col, str) else pass_col
    return docs.groupBy(group_col).agg(
        F.count("*").alias("domain_n_docs"),
        F.round(
            F.sum(F.coalesce(p.cast("int"), F.lit(0)))
            / F.count("*").cast("double"),
            6,
        ).alias("domain_pass_frac"),
    )


def domain_quality_gate(
    docs: DataFrame,
    pass_col: str | Column,
    group_col: str = "source",
    min_docs: int = 5,
    min_pass_frac: float = 0.5,
    default_keep: bool = True,
) -> DataFrame:
    """Input columns + (domain_n_docs, domain_pass_frac, domain_kept).

    ``domain_kept`` is true when the domain's pass fraction clears
    ``min_pass_frac``, or when the domain is too small to judge
    (< ``min_docs``) and ``default_keep`` is set. Callers filter on
    ``domain_kept`` to drop condemned domains wholesale, or keep the
    column as a training-mix feature."""
    stats = domain_quality_stats(docs, pass_col, group_col)
    verdict = F.when(
        F.col("domain_n_docs") < min_docs, F.lit(bool(default_keep))
    ).otherwise(F.col("domain_pass_frac") >= F.lit(float(min_pass_frac)))
    gated = stats.select(
        group_col,
        "domain_n_docs",
        "domain_pass_frac",
        verdict.alias("domain_kept"),
    )
    return docs.join(F.broadcast(gated), group_col)

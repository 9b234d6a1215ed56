"""Domain/URL blocklist gating for the crawl frontier — the UT1-style
pre-fetch filter every production crawler runs between "discovered" and
"scheduled": drop URLs whose registrable domain (or any parent domain)
is on a blocklist, and URLs whose path matches a keyword pattern.

Two scale modes, chosen by how the blocklist arrives:

* **Inline mode** (``blocked_domains`` is a Python sequence) — the
  domains become an array LITERAL and the gate is a single JVM
  ``arrays_overlap`` over the host's parent-domain expansion: zero
  joins, zero shuffles, fuses into the frontier scan. Right for
  blocklists up to a few thousand entries (driver-side literal).
* **Join mode** (``blocked_domains`` is a DataFrame with a ``domain``
  column) — parent-domain expansion is exploded and equi-joined
  (broadcast) against the blocklist, then the matched URL set is
  anti-joined back. Equi-join keys keep it a BroadcastHashJoin — the
  naive ``host LIKE '%.'||domain`` predicate would degenerate into a
  BroadcastNestedLoopJoin, O(urls × domains), which at 10^10 URLs ×
  10^6 blocked domains is the difference between a map stage and a
  never-finishing cross product.

Subdomain semantics: a blocked ``example.com`` blocks ``example.com``
and every ``*.example.com``, and the bare TLD is never generated as a
candidate (blocking ``com`` must be an explicit blocklist entry of the
full host, not an accident of suffix expansion).

Reference anchor: the reference engine has no blocklist (its crawl loop
trusts its seed manifest, warcsum.1:19-62); this operator is part of the
§2.12 training-data/crawl surface the build brief mandates beyond it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parent_domains(host: Column) -> Column:
    """All suffix domains of ``host`` except the bare TLD, the host
    itself first: a.b.example.com → [a.b.example.com, b.example.com,
    example.com]. Hosts with a single label (``localhost``) expand to
    just themselves."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(n <= 1, F.array(host)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
        )
    )


def blocklist_gate(
    urls: DataFrame,
    blocked_domains: DataFrame | Sequence[str],
    url_patterns: Sequence[str] = (),
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Survivor URLs: rows whose host is not under any blocked domain
    and whose URL matches no pattern. Preserves the input schema."""
    out = urls
    if url_patterns:
        combined = "|".join(f"(?:{p})" for p in url_patterns)
        out = out.filter(~F.col(url_col).rlike(combined))

    cands = parent_domains(F.col(host_col))
    if isinstance(blocked_domains, DataFrame):
        matched = (
            out.select(url_col, F.explode(cands).alias("_cand"))
            .join(
                F.broadcast(blocked_domains.select(F.col("domain").alias("_cand"))),
                "_cand",
            )
            .select(url_col)
            .distinct()
        )
        return out.join(matched, url_col, "left_anti")
    if not blocked_domains:  # empty inline list: nothing to gate on
        return out
    domains = F.array(*[F.lit(d) for d in blocked_domains])
    # coalesce: a null host yields a null overlap, and filter(~NULL)
    # would silently drop the row — join mode keeps null-host rows (they
    # match no blocklist entry), so inline mode must too
    return out.filter(~F.coalesce(F.arrays_overlap(cands, domains), F.lit(False)))

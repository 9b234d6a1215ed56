"""T36 — global crawl-budget allocation across hosts: a round can fetch
B pages total (bandwidth / cost ceiling); each host should receive
fetch slots proportional to its pending priority mass, within
[min_per_host, max_per_host] caps. This is the planner that connects
the priority signal (seed scores, PageRank) to the per-host budgets the
politeness scheduler consumes — closing the loop
``pagerank → budgets → schedule_per_host``.

Apportionment is the largest-remainder (Hamilton) method, the standard
deterministic way to turn fractional shares into integers that sum
EXACTLY to B: floor every share, then hand the leftover slots to the
largest remainders (ties broken by host ASC). Proportional-then-round
alternatives either miss B or need iterative correction.

Scale shape: one host-keyed aggregation over the frontier (map-side
combine; the frontier is already host-partitioned so this is cheap),
then every remaining step runs on the HOST table — dimension-sized
(10^7 hosts at a 10^10-URL frontier), which is why the two global
windows (total mass, remainder rank) are acceptable here and would not
be on the URL table. Mass is rounded after aggregation so the float
total is engine-exact (same idiom as operators/pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_host_budgets(
    pending: DataFrame,
    total_budget: int,
    min_per_host: int = 0,
    max_per_host: int | None = None,
    host_col: str = "host",
    priority_col: str = "priority",
    mass_scale: int = 6,
) -> DataFrame:
    """(host, mass, budget): integer budgets summing to
    min(total_budget, sum of caps), proportional to per-host priority
    mass under the caps. Hosts with no positive mass get
    ``min_per_host``. Caps are applied before apportionment (capped
    mass is redistributed by the remainder pass, not lost)."""
    mass = (
        pending.groupBy(host_col)
        .agg(F.round(F.sum(priority_col), mass_scale).alias("mass"))
        .filter(F.col(host_col).isNotNull())
    )
    total = Window.partitionBy()  # host-table grain: dimension-sized
    share = F.col("mass") / F.sum("mass").over(total) * F.lit(total_budget)
    capped = share
    if max_per_host is not None:
        capped = F.least(share, F.lit(float(max_per_host)))
    capped = F.greatest(capped, F.lit(float(min_per_host)))
    base = F.floor(capped).cast("long")
    rem = capped - base
    with_base = mass.select(
        host_col,
        "mass",
        base.alias("_base"),
        F.round(rem, mass_scale).alias("_rem"),
    )
    leftover = (
        F.lit(total_budget) - F.sum("_base").over(total)
    ).cast("long")
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_rem"), F.asc(host_col))
    )
    out = with_base.select(
        host_col,
        "mass",
        "_base",
        rank.alias("_rank"),
        leftover.alias("_left"),
    )
    budget = F.col("_base") + F.when(
        (F.col("_rank") <= F.col("_left")) & (F.col("_left") > 0), 1
    ).otherwise(0)
    if max_per_host is not None:
        budget = F.least(budget, F.lit(max_per_host).cast("long"))
    return out.select(host_col, "mass", budget.cast("long").alias("budget"))

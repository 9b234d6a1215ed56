"""T38 — crawl-trap detection: flag hosts whose URL space is exploding
under a single path template (calendar pages, session-id rewrites,
faceted-search permutations — the classic spider traps every production
crawler budgets against; cf. Heritrix's pathological-URI heuristics).
The frontier composes this AFTER the seen-gate and BEFORE politeness:
a trapped host's pending URLs are throttled or dropped instead of
eating the whole per-host budget on one infinite calendar.

Signal (deterministic, engine-portable):

* ``template(url)`` = the URL path with every digit run collapsed to
  ``<n>`` — ``/cal/2024/01/05`` and ``/cal/2024/01/06`` are the SAME
  generator, ``/about`` and ``/contact`` are different ones;
* per host: how many distinct URLs the single HOTTEST template
  produced (``top_urls``) and its share of the host's distinct URLs
  (``top_share``);
* trap ⇔ ``n_urls >= min_urls`` ∧ ``top_urls >= min_template_urls`` ∧
  ``top_share >= min_share`` — i.e. the host is big AND one generator
  dominates it. A large normal site spreads its URLs over many
  templates; a trap concentrates them in one.

Plan shape: one (host, template) aggregation with map-side combine over
the URL stream (the only corpus-sized exchange — slim keys, counts
only), then a host-keyed window on the AGGREGATED table, which is
dimension-sized (hosts × active templates, ~10^7 rows at 10^10 URLs).
The URL strings themselves never reshuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_template(url: Column) -> Column:
    """Path-generator template of a URL: scheme+host dropped, digit
    runs collapsed to ``<n>``, query collapsed to its sorted-free
    presence marker ``?`` (query VALUES are the other explosion axis,
    so two query strings with the same path always collide here)."""
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    path = F.regexp_extract(rest, r"^[^/]*(/[^?#]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tmpl = F.regexp_replace(path, "[0-9]+", "<n>")
    has_q = F.regexp_extract(rest, r"^[^?#]*(\?)", 1)
    return F.concat(tmpl, has_q)


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_urls: int = 50,
    min_template_urls: int = 30,
    min_share: float = 0.5,
) -> DataFrame:
    """(host, n_urls, n_templates, top_template, top_urls, top_share,
    is_trap) — one row per host. ``top_share`` is rounded to 6 dp so
    the float is engine-exact."""
    per_tmpl = (
        urls.select(
            F.col(host_col).alias("host"),
            url_template(F.col(url_col)).alias("template"),
            F.col(url_col).alias("url"),
        )
        .groupBy("host", "template")
        .agg(F.count_distinct("url").alias("t_urls"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("t_urls").desc(), F.col("template").asc()
    )
    per_host = (
        per_tmpl.withColumn("_rk", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum("t_urls").alias("n_urls"),
            F.count("*").alias("n_templates"),
            F.max(F.when(F.col("_rk") == 1, F.col("template"))).alias(
                "top_template"
            ),
            F.max(F.when(F.col("_rk") == 1, F.col("t_urls"))).alias("top_urls"),
        )
    )
    return per_host.select(
        "host",
        "n_urls",
        "n_templates",
        "top_template",
        "top_urls",
        F.round(F.col("top_urls") / F.col("n_urls"), 6).alias("top_share"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (F.col("top_urls") >= F.lit(min_template_urls))
            & (F.col("top_urls") / F.col("n_urls") >= F.lit(min_share))
        ).alias("is_trap"),
    )


def trap_gate(
    candidates: DataFrame,
    traps: DataFrame,
    host_col: str = "host",
    keep_per_trap_host: int | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Frontier composition: drop (default) or throttle candidates on
    trapped hosts. With ``keep_per_trap_host=k`` the top-k by
    (priority DESC, url ASC) survive per trapped host — the host stays
    alive without the trap swallowing its budget. The throttle reuses
    the politeness two-phase salted top-k (politeness.py): trapped
    hosts are by definition the HOTTEST hosts, i.e. exactly the rows a
    naive per-host window would pile into one task."""
    trapped = traps.filter(F.col("is_trap")).select(
        F.col("host").alias("_trap_host")
    )
    joined = candidates.join(
        F.broadcast(trapped),
        candidates[host_col] == F.col("_trap_host"),
        "left",
    )
    untrapped = joined.filter(F.col("_trap_host").isNull()).drop("_trap_host")
    if keep_per_trap_host is None:
        return untrapped
    from warcsum_spark.frontier.politeness import schedule_per_host

    kept = schedule_per_host(
        joined.filter(F.col("_trap_host").isNotNull()).drop("_trap_host"),
        politeness=None,
        default_budget=keep_per_trap_host,
        salt_buckets=salt_buckets,
    ).drop("host_rank")
    return untrapped.unionByName(kept)

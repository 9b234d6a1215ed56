"""T45 — DUST-style URL alias-rule mining: which query parameters
never change the content?

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW 2007) observed that large crawls are full of URL aliases —
session ids, tracking params, sort orders — and that alias RULES can
be mined from the crawl's own evidence and then applied to collapse
the frontier before fetching. This operator mines the most valuable
rule family relationally: *parameter-irrelevance* — for a (host,
param) pair, dropping ``param`` from any URL yields a URL whose
fetched content digest is identical.

Evidence model, per URL u with digest d and parameter p:

* drop p from u (canonically: sort the remaining params) → variant v
* if some crawled URL canonicalizes to v with digest d  → **support**
* if some crawled URL canonicalizes to v with digest ≠ d → **violation**
* if v was never crawled → no evidence

A rule (host, param) is emitted when supports ≥ min_support and
violations = 0 — conservative by construction: one counterexample
kills the rule. ``apply_dust_rules`` then rewrites URLs by stripping
ruled-out params (broadcast join on the dimension-sized rule table),
which is what the frontier's seen-set should key on.

Plan shape at 10^10 URLs: parse/canonicalize is map-only; the only
data-sized exchanges are the variant→target hash join keyed on the
canonical URL string and the (host, param) aggregation whose shuffle
rows carry two booleans. Variants explode by the per-URL param count
(bounded, typically ≤ 5); the rule table is dimension-sized and
broadcast on application. No all-pairs comparison exists — the
digest join IS the similarity test, exactly the trick warcsum itself
uses for content dedup (warcsum.c digest manifest → warccollres.c
collision groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _parsed(df: DataFrame, url_col: str) -> DataFrame:
    parts = F.split(F.col(url_col), r"\?", 2)
    base = parts[0]
    query = F.when(F.size(parts) > 1, F.get(parts, 1))
    params = F.when(
        query.isNotNull() & (query != ""), F.split(query, "&")
    ).otherwise(F.array().cast("array<string>"))
    return df.withColumn("_base", base).withColumn("_params", params)


def _ckey(base: Column, params: Column) -> Column:
    """Canonical key: base?sorted-params (base alone when empty) —
    order-insensitive so a=1&b=2 and b=2&a=1 are the same page.
    ``sort_array`` (codegen'd SortArray) rather than ``array_sort``:
    the latter carries a comparator lambda that forces interpreted
    higher-order evaluation per row; identical order here (params are
    split() results, never null)."""
    return F.concat(
        base,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.concat_ws("&", F.sort_array(params))),
        ).otherwise(F.lit("")),
    )


def mine_param_rules(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 5,
) -> DataFrame:
    """(host, param, supports) for every parameter-irrelevance rule the
    crawl evidence proves: supports ≥ min_support, zero violations."""
    # cached: targets and variants both consume the parse, and the
    # explode's pushed-down filter otherwise re-evaluates the collapsed
    # url→split projection chain several times per row (measured ~10x on
    # the variants stage; the lsh_candidate_pairs cache precedent —
    # parse-grain rows, spills to disk at scale)
    parsed = _parsed(df, url_col).cache()
    targets = parsed.select(
        _ckey(F.col("_base"), F.col("_params")).alias("_tkey"),
        F.col(digest_col).alias("_tdigest"),
    ).distinct()

    p = F.col("_p")
    # sort the param list ONCE per URL; each variant key then drops its
    # param with codegen'd array_remove over the pre-sorted array.
    # Equivalent to sort(filter(params, != p)): removing every copy of p
    # commutes with sorting — and it avoids both the per-variant
    # interpreted filter lambda and the per-variant re-sort (measured
    # ~4x on the variants stage).
    sorted_params = F.sort_array("_params")
    removed = F.array_remove("_sorted", p)
    variants = (
        parsed.select(
            F.col(host_col),
            F.col(digest_col),
            F.col("_base"),
            sorted_params.alias("_sorted"),
            F.explode("_params").alias("_p"),
        )
        .withColumn("_param", F.get(F.split(p, "=", 2), 0))
        .withColumn(
            "_vkey",
            F.concat(
                F.col("_base"),
                F.when(
                    F.size(removed) > 0,
                    F.concat(F.lit("?"), F.concat_ws("&", removed)),
                ).otherwise(F.lit("")),
            ),
        )
    )
    joined = variants.join(
        targets, variants["_vkey"] == targets["_tkey"], "left"
    )
    agg = joined.groupBy(
        F.col(host_col).alias("host"), F.col("_param").alias("param")
    ).agg(
        F.sum(
            (F.col("_tdigest") == F.col(digest_col)).cast("long")
        ).alias("supports"),
        F.sum(
            (
                F.col("_tkey").isNotNull()
                & (F.col("_tdigest") != F.col(digest_col))
            ).cast("long")
        ).alias("violations"),
    )
    return agg.where(
        (F.col("violations") == 0) & (F.col("supports") >= min_support)
    ).select("host", "param", "supports")


def apply_dust_rules(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Rewrite URLs by stripping every ruled-irrelevant param for the
    row's host (rule table broadcast as a per-host param array), then
    re-canonicalize. URLs on hosts without rules pass through to their
    sorted-param canonical form."""
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_set("param").alias("_rparams")
    )
    parsed = _parsed(df, url_col).join(
        F.broadcast(per_host), F.col(host_col) == F.col("_rhost"), "left"
    )
    rp = F.coalesce(F.col("_rparams"), F.array().cast("array<string>"))
    kept = F.filter(
        "_params",
        lambda x: ~F.array_contains(rp, F.get(F.split(x, "=", 2), 0)),
    )
    return parsed.withColumn(out_col, _ckey(F.col("_base"), kept)).drop(
        "_base", "_params", "_rhost", "_rparams"
    )


def dust_oracle_sql(source_cte: str, min_support: int = 5) -> str:
    """The identical mining math as DuckDB SQL, generated beside the
    implementation. ``source_cte`` must define ``src(host, url,
    digest)``."""
    ckey = (
        "p.base || CASE WHEN len({ps}) > 0 "
        "THEN '?' || array_to_string(list_sort({ps}), '&') ELSE '' END"
    )
    return f"""
WITH {source_cte},
p AS (
  SELECT host, digest,
         string_split(url, '?')[1] AS base,
         CASE WHEN len(string_split(url, '?')) > 1
                   AND string_split(url, '?')[2] <> ''
              THEN string_split(string_split(url, '?')[2], '&')
              ELSE [] END AS params
  FROM src
), targets AS (
  SELECT DISTINCT {ckey.format(ps='p.params')} AS tkey, digest AS tdigest
  FROM p
), variants AS (
  SELECT p.host, p.digest,
         string_split(u.param, '=')[1] AS param,
         {ckey.format(ps="list_filter(p.params, x -> x <> u.param)")} AS vkey
  FROM p, unnest(p.params) AS u(param)
), agg AS (
  SELECT v.host, v.param,
         sum(CASE WHEN t.tdigest = v.digest THEN 1 ELSE 0 END) AS supports,
         sum(CASE WHEN t.tkey IS NOT NULL AND t.tdigest <> v.digest
                  THEN 1 ELSE 0 END) AS violations
  FROM variants v LEFT JOIN targets t ON v.vkey = t.tkey
  GROUP BY v.host, v.param
)
SELECT host, param, supports FROM agg
WHERE violations = 0 AND supports >= {min_support}
"""

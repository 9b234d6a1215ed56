"""T119 — URL-shape spam signals with population z-score outliers
(Fetterly, Manasse & Najork, "Spam, damn spam, and statistics",
WebDB 2004 — the paper's core observation: machine-generated spam
URLs are DISTRIBUTIONAL outliers in cheap lexical properties (length,
digit density, path depth, hostname shape), so flagging hosts a few
standard deviations from the population mean catches link farms
before a single page is fetched or parsed; the modern descendants are
the URL-feature stages of every production spam classifier).

Where it sits in the frontier: T67 mines path TEMPLATES (trap
detection by repetition), T45 collapses DUST aliases, T103 catches
mirror hosts by shared content — this operator is the zero-content
tier: it reads nothing but the URL strings already in the frontier
and prices each HOST's url-shape against the whole crawl's
distribution, feeding T73's domain gate and T36's budgets.

Pinned arithmetic (the T97/T102 exact-integer discipline):

* per-URL features are INTEGERS (length, digit count, path depth)
  computed JVM-side; per-host sums are exact;
* each host feature (mean length, digit share, mean depth) is one
  IEEE division, quantized to a 1e6-scaled exact integer
  (``round(x·1e6)`` cast DECIMAL(38,0)/HUGEINT — the T102 idiom) so
  every cross-host sum is partitioning-proof;
* the population z-score is computed ENTIRELY from exact integers:
  z = (n·s_h − S) / sqrt(n·Q − S²)  over the scaled features s_h
  (algebraically (x−μ)/σ_pop with both divisions folded away), ONE
  sqrt + ONE division per feature, rounded to 6 — bit-identical
  cross-engine; zero variance pins z = 0 (no outliers);
* ``is_spam`` tests the ROUNDED z's against the threshold, so the
  flag is engine-exact.

Plan shape at 100 TB: feature extraction is map-only codegen; ONE
corpus-grain exchange (the map-side-combinable groupBy(host)); the
population moments are one scalar aggregate over the dimension-sized
host table, broadcast back via the audited one-row crossJoin pattern
(pagerank.py's normalizer shape); the z projection is map-only on the
host table. URL text never shuffles — only (host, 4 ints) rows.

No reference counterpart (warcsum has no frontier); §2.12 frontier
hygiene tier, sibling of T67/T45/T103.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

FEATURES = ("len", "dig", "dep")


def url_spam_signals(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    z_thresh: float = 2.0,
) -> DataFrame:
    """(host, n_urls, mean_len, digit_share, mean_depth, z_len,
    z_digit, z_depth, is_spam) — one row per host; z's are population
    z-scores of the host's url-shape features over all hosts; a host
    is flagged when ANY |z| exceeds ``z_thresh``."""
    if z_thresh <= 0:
        raise ValueError(f"z_thresh must be positive, got {z_thresh}")
    u = F.col(url_col)
    feats = urls.select(
        F.col(host_col).alias("host"),
        F.length(u).alias("f_len"),
        (
            F.length(u) - F.length(F.regexp_replace(u, "[0-9]", ""))
        ).alias("f_dig"),
        # path depth: '/' occurrences beyond the scheme's two
        (
            F.length(u) - F.length(F.regexp_replace(u, "/", "")) - F.lit(2)
        ).alias("f_dep"),
    )
    per_host = feats.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("f_len").alias("sl"),
        F.sum("f_dig").alias("sd"),
        F.sum("f_dep").alias("sp"),
    )
    n_u = F.col("n_urls").cast("double")
    raw = {
        "len": F.col("sl").cast("double") / n_u,
        "dig": F.when(
            F.col("sl") > 0,
            F.col("sd").cast("double") / F.col("sl").cast("double"),
        ).otherwise(F.lit(0.0)),
        "dep": F.col("sp").cast("double") / n_u,
    }
    scaled = per_host.select(
        "host",
        "n_urls",
        *[F.round(raw[k], 6).alias(f"feat_{k}") for k in FEATURES],
        *[
            F.round(raw[k] * F.lit(1e6)).cast(_DEC).alias(f"s_{k}")
            for k in FEATURES
        ],
    )
    moments = scaled.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_hosts"),
        *[F.sum(f"s_{k}").alias(f"sum_{k}") for k in FEATURES],
        *[
            F.sum(F.col(f"s_{k}") * F.col(f"s_{k}")).alias(f"q_{k}")
            for k in FEATURES
        ],
    )
    joined = scaled.crossJoin(F.broadcast(moments))

    def _z(k: str):
        n = F.col("n_hosts")
        num = (n * F.col(f"s_{k}") - F.col(f"sum_{k}")).cast("double")
        var = (
            n * F.col(f"q_{k}") - F.col(f"sum_{k}") * F.col(f"sum_{k}")
        ).cast("double")
        return F.when(
            var > 0, F.round(num / F.sqrt(var), 6)
        ).otherwise(F.lit(0.0))

    out = joined.select(
        "host",
        "n_urls",
        F.col("feat_len").alias("mean_len"),
        F.col("feat_dig").alias("digit_share"),
        F.col("feat_dep").alias("mean_depth"),
        _z("len").alias("z_len"),
        _z("dig").alias("z_digit"),
        _z("dep").alias("z_depth"),
    )
    t = F.lit(float(z_thresh))
    return out.withColumn(
        "is_spam",
        (F.abs(F.col("z_len")) > t)
        | (F.abs(F.col("z_digit")) > t)
        | (F.abs(F.col("z_depth")) > t),
    )


def url_spam_oracle_sql(
    urls_sql: str,
    host_col: str = "host",
    url_col: str = "url",
    z_thresh: float = 2.0,
) -> str:
    """The IDENTICAL pinned arithmetic for DuckDB over ``urls_sql``
    (a SELECT yielding host and url columns)."""
    feat_exprs = {
        "len": "CAST(sl AS DOUBLE) / CAST(n_urls AS DOUBLE)",
        "dig": "CASE WHEN sl > 0 THEN CAST(sd AS DOUBLE) / CAST(sl AS DOUBLE) ELSE 0.0 END",
        "dep": "CAST(sp AS DOUBLE) / CAST(n_urls AS DOUBLE)",
    }
    feat_cols = ", ".join(
        f"round({e}, 6) AS feat_{k}, "
        f"CAST(round(({e}) * 1e6) AS HUGEINT) AS s_{k}"
        for k, e in feat_exprs.items()
    )
    mom_cols = ", ".join(
        f"sum(s_{k}) AS sum_{k}, sum(s_{k} * s_{k}) AS q_{k}"
        for k in FEATURES
    )
    z_exprs = {
        k: (
            f"CASE WHEN CAST(n_hosts * q_{k} - sum_{k} * sum_{k} AS DOUBLE) > 0 "
            f"THEN round(CAST(n_hosts * s_{k} - sum_{k} AS DOUBLE) "
            f"/ sqrt(CAST(n_hosts * q_{k} - sum_{k} * sum_{k} AS DOUBLE)), 6) "
            f"ELSE 0.0 END"
        )
        for k in FEATURES
    }
    return f"""
WITH feats AS (
  SELECT {host_col} AS host,
         length({url_col}) AS f_len,
         length({url_col})
           - length(regexp_replace({url_col}, '[0-9]', '', 'g')) AS f_dig,
         length({url_col})
           - length(regexp_replace({url_col}, '/', '', 'g')) - 2 AS f_dep
  FROM ({urls_sql})
), per_host AS (
  SELECT host, count(*)::BIGINT AS n_urls,
         sum(f_len)::BIGINT AS sl, sum(f_dig)::BIGINT AS sd,
         sum(f_dep)::BIGINT AS sp
  FROM feats GROUP BY host
), scaled AS (
  SELECT host, n_urls, {feat_cols} FROM per_host
), moments AS (
  SELECT CAST(count(*) AS HUGEINT) AS n_hosts, {mom_cols} FROM scaled
), z AS (
  SELECT host, n_urls, feat_len AS mean_len, feat_dig AS digit_share,
         feat_dep AS mean_depth,
         {z_exprs['len']} AS z_len,
         {z_exprs['dig']} AS z_digit,
         {z_exprs['dep']} AS z_depth
  FROM scaled CROSS JOIN moments
)
SELECT *, (abs(z_len) > {z_thresh!r} OR abs(z_digit) > {z_thresh!r}
           OR abs(z_depth) > {z_thresh!r}) AS is_spam
FROM z
"""

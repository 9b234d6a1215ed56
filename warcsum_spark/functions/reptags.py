"""T80 — Robots-Exclusion-Protocol page-level opt-out gating (the
in-page half of REP that robots.txt (R4, frontier/robots.py) cannot
see: ``<meta name="robots" content="noindex, nofollow">`` tags in the
HTML head and ``X-Robots-Tag`` HTTP response headers, per the public
robots-meta specification that grew out of the 1996 REP meta extension,
plus the newer ``noai`` / ``noimageai`` opt-out tokens some publishers
emit for training-data pipelines specifically).

A crawl-scale corpus build must honor these AFTER fetch: robots.txt
gates which URLs are requested (R4), while meta/header directives gate
what a fetched page may be used for — indexing, link following,
archiving, snippets, and (noai) model training. The reference engine
has no analogue (warcsum.c digests whatever is in the archive); this is
part of the §2.12 training-data surface the build brief mandates.

Spark-first plan: **pure map-only JVM** — two ``regexp_extract_all``
passes over the HTML (attribute order varies in the wild, so one
pattern matches ``name= … content=`` and one the reverse), one token
split over the header value, then set-membership flags on the unioned
directive list. No UDFs, no exchanges: the gate composes with any
downstream plan without adding a shuffle, and Catalyst prunes the html
column out of scans whenever a caller only keeps the flags.

Directive semantics implemented (most-restrictive-wins):

- tokens are comma-separated, whitespace-trimmed, lowercased;
- ``none``   == ``noindex`` + ``nofollow`` (per the public spec);
- ``all``    == no restriction (the default; the token itself is a no-op);
- an ``X-Robots-Tag`` value may carry an ``agent:`` prefix — a prefixed
  rule only applies when the prefix equals ``agent`` (case-insensitive);
  unprefixed rules apply to everyone. Only the single configured agent
  is modeled (the engine crawls as one bot), mirroring R4's gate.

``train_eligible`` — the column downstream corpus stages key on — is
``NOT (noindex OR noai)``: pages opted out of indexing or of AI
training both leave the corpus; ``follow_links`` (``NOT nofollow``)
is the frontier-side signal for T33/R6 outlink extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Meta-tag patterns. Case-insensitive, single tag scope ([^>]*), content
# captured from a quoted attribute value. The name alternation is bound
# at call time (robots + the configured agent token). Kept RE2-safe so
# the DuckDB oracle can run the IDENTICAL pattern.
_META_NAME_FIRST = (
    r'(?i)<meta\b[^>]*\bname\s*=\s*["\']?(?:{names})["\'\s][^>]*'
    r'\bcontent\s*=\s*["\']([^"\']*)["\']'
)
_META_CONTENT_FIRST = (
    r'(?i)<meta\b[^>]*\bcontent\s*=\s*["\']([^"\']*)["\'][^>]*'
    r'\bname\s*=\s*["\']?(?:{names})["\'\s]'
)

#: Directive tokens surfaced as boolean flag columns.
DIRECTIVES = ("noindex", "nofollow", "noarchive", "nosnippet", "noai",
              "noimageai")


def _meta_patterns(agent: str) -> tuple[str, str]:
    names = "robots" if agent == "robots" else f"robots|{agent}"
    return (
        _META_NAME_FIRST.format(names=names),
        _META_CONTENT_FIRST.format(names=names),
    )


def _tokens(raw_list: Column) -> Column:
    """comma-joined directive strings -> flat trimmed lowercase tokens."""
    return F.flatten(
        F.transform(
            raw_list,
            lambda s: F.transform(
                F.split(s, ","), lambda t: F.lower(F.trim(t))
            ),
        )
    )


def rep_directives(
    html: Column, header: Column | None = None, agent: str = "robots"
) -> Column:
    """array<string> of effective REP directive tokens for one page —
    meta tags (both attribute orders) unioned with the X-Robots-Tag
    header, agent-scoped header rules resolved against ``agent``."""
    p_nf, p_cf = _meta_patterns(agent.lower())
    metas = F.concat(
        F.regexp_extract_all(html, F.lit(p_nf), F.lit(1)),
        F.regexp_extract_all(html, F.lit(p_cf), F.lit(1)),
    )
    parts = [_tokens(metas)]
    if header is not None:
        # "agent: noindex, nofollow" | "noindex" — strip a matching
        # agent prefix, blank out a non-matching one entirely.
        hdr = F.trim(F.coalesce(header, F.lit("")))
        pfx = F.lower(F.trim(F.regexp_extract(hdr, r"^([^:,]+):", 1)))
        scoped = F.when(
            pfx == "", hdr
        ).when(
            pfx == agent.lower(),
            F.regexp_replace(hdr, r"^[^:,]+:", ""),
        ).otherwise(F.lit(""))
        parts.append(_tokens(F.array(scoped)))
    toks = F.concat(*parts) if len(parts) > 1 else parts[0]
    return F.filter(toks, lambda t: t != "")


def gate_optouts(
    pages: DataFrame,
    html_col: str = "html",
    header_col: str | None = "x_robots_tag",
    agent: str = "robots",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(keep_cols..., noindex, nofollow, noarchive, nosnippet, noai,
    noimageai, train_eligible, follow_links) — one boolean per REP
    directive plus the two composed gates. Map-only; ``none`` implies
    noindex+nofollow; a missing/NULL html or header contributes no
    directives."""
    hdr = F.col(header_col) if header_col else None
    toks = rep_directives(
        F.coalesce(F.col(html_col).cast("string"), F.lit("")), hdr, agent
    )
    out = pages.select(*keep_cols, toks.alias("_toks"))
    has = {d: F.array_contains("_toks", d) for d in DIRECTIVES}
    none_tok = F.array_contains("_toks", "none")
    flags = dict(has)
    flags["noindex"] = has["noindex"] | none_tok
    flags["nofollow"] = has["nofollow"] | none_tok
    cols = [F.col(c) for c in keep_cols]
    cols += [flags[d].alias(d) for d in DIRECTIVES]
    cols.append((~(flags["noindex"] | flags["noai"])).alias("train_eligible"))
    cols.append((~flags["nofollow"]).alias("follow_links"))
    return out.select(*cols)

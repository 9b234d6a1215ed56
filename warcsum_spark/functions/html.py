"""HTML → text extraction and related webtext kernels, in TWO tiers:

**Byte tier (Arrow UDF)** — the input_hint per-row invariant: the engine's
``text`` must be byte-identical per url to the oracle's
``warcsum_spark.oracle.extract_text``. Spec: remove <script>/<style>
subtrees and comments, strip all tags, decode the six basic entities,
collapse whitespace, trim, decode UTF-8 with replacement. Runs as an
Arrow-batched pandas UDF (the subtree rule needs a regex backreference,
which Java regex/RE2 chains can't express); regexes are precompiled once
per worker. Written independently of the oracle implementation — the
tests cross-check the two.

**JVM tier (``html_to_text``)** — the same extraction idea as a pure
Catalyst ``regexp_replace``/``replace`` chain (zero Python at 100 TB),
restricted to patterns that behave identically under Java regex (Spark)
and RE2 (DuckDB) — no backreferences, no lookaround — so the whole
operator is reproducible in ANSI SQL for the driver's correctness gate
(``html_to_text_sql``). Differences from the byte tier, by construction:
script/style close-tag matching is per-name (no backreference), entity
decode order puts ``&amp;`` LAST (so ``&amp;lt;`` decodes to the literal
``&lt;``), and it operates on string columns (pass
``F.decode(col, 'UTF-8')`` for binary html).

Plus ``redact_pii`` — typed placeholder redaction with the same
dual-engine (Java/RE2) reproducibility property.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# byte tier — input_hint invariant (Arrow UDF, oracle-twinned)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_TAG = re.compile(rb"(?s)<[^>]*>")
_WS = re.compile(rb"\s+")
_ENTITIES = (
    (b"&amp;", b"&"),
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&nbsp;", b" "),
)


def extract_text_bytes(html: bytes) -> str:
    s = _SCRIPT_STYLE.sub(b" ", html)
    s = _COMMENT.sub(b" ", s)
    s = _TAG.sub(b" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(b" ", s).strip().decode("utf-8", "replace")


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(lambda b: None if b is None else extract_text_bytes(bytes(b)))


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    return df.withColumn(out_col, extract_text(F.col(html_col)))


_HREF = re.compile(rb"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"'<>\s]+)""")


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """href values of <a> tags, document order, raw (un-canonicalized —
    the frontier canonicalizes + dedupes downstream)."""
    return html.map(
        lambda b: None
        if b is None
        else [m.decode("utf-8", "replace") for m in _HREF.findall(bytes(b))]
    )


# ---------------------------------------------------------------------------
# JVM tier — SQL-reproducible extraction (see module docstring)
# ---------------------------------------------------------------------------

# (?is) = case-insensitive + dotall; non-greedy body; supported by both
# Java regex and RE2
_DROP_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
_TAG_PATTERN = r"<[^>]*>"

# decode order matters in this tier: &amp; must come last (see module
# docstring)
_SQL_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Extracted visible text of an HTML string column (see module
    docstring for the exact approximation). For a ``binary`` html column
    pass ``F.decode(col, 'UTF-8')``."""
    out = html
    for pat in _DROP_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _TAG_PATTERN, " ")
    for ent, rep in _SQL_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The same extraction as ``html_to_text`` over a DuckDB SQL
    expression — identical pattern list, identical order."""
    out = expr
    for pat in _DROP_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG_PATTERN}', ' ', 'g')"
    for ent, rep in _SQL_ENTITIES:
        ent_sql = ent.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent_sql}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# conservative patterns, identical under Java regex and RE2. Rule ORDER is
# semantic: emails first (their digits must not half-match the phone
# rule), SSN and IPv4 before phone (both are digit sequences the phone
# class would otherwise swallow — the phone class contains '-' and '.').
_PII_RULES = [
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # US-style SSN
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # IPv4 (before phone: a dotted quad is also a separator-digit run)
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international-ish phone: optional +country, digits with common
    # separators; interior width 7..16 covers '+1 (555) 010-1234' (14
    # interior chars — a 13 cap made the match stop early and leak the
    # last digit group), digit-bounded both ends
    (r"\+?\d[\d\-(). ]{7,16}\d\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace email / SSN / phone / IPv4 spans with typed placeholders —
    rule order is fixed (emails first so their digits never half-match the
    phone rule). Pure JVM regex; SQL-reproducible via ``redact_pii_sql``."""
    out = text
    for pat, rep in _PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii_sql(expr: str) -> str:
    """The same redaction over a DuckDB SQL expression."""
    out = expr
    for pat, rep in _PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out

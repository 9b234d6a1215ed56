"""HTML → text extraction for the web-pages table (input_hint columns
``html: binary`` / ``text: string``).

A deterministic, documented APPROXIMATION of boilerplate-free extraction
(real pipelines use a DOM parser; this is the regex tier that runs as pure
JVM expressions at 100 TB with zero Python):

1. drop ``<script>``/``<style>`` elements and HTML comments,
2. replace every remaining tag with a space (block separation),
3. decode the five basic named entities plus ``&#39;``/``&nbsp;``
   (``&amp;`` LAST so ``&amp;lt;`` decodes to the literal ``&lt;``),
4. collapse whitespace runs and trim.

Every step is a ``regexp_replace``/``replace`` with patterns chosen to
behave identically under Java regex (Spark) and RE2 (DuckDB) — no
backreferences, no lookaround — so the whole operator is reproducible in
ANSI SQL for the driver's correctness gate (see ``html_to_text_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?is) = case-insensitive + dotall; non-greedy body; supported by both
# Java regex and RE2
_DROP_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
_TAG_PATTERN = r"<[^>]*>"

# decode order matters: &amp; must come last (see module docstring)
_ENTITIES = [
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
    for ent, rep in _ENTITIES:
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
    for ent, rep in _ENTITIES:
        ent_sql = ent.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent_sql}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# conservative patterns, identical under Java regex and RE2
_PII_RULES = [
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # US-style SSN
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # international-ish phone: +optional country code, 9..14 digits with
    # common separators, digit-bounded
    (r"\+?\d[\d\-(). ]{7,13}\d\b", "<PHONE>"),
    # IPv4
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
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

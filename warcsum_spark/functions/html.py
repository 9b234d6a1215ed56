"""HTML → text extraction (the input_hint per-row invariant: the engine's
``text`` must be byte-identical per url to the oracle's
``warcsum_spark.oracle.extract_text``).

Spec: remove <script>/<style> subtrees and comments, strip all tags,
decode the six basic entities, collapse whitespace, trim, decode UTF-8
with replacement. Runs as an Arrow-batched pandas UDF (pure-Python string
work with no Spark built-in equivalent); regexes are precompiled once per
worker. Written independently of the oracle implementation — the tests
cross-check the two."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

"""T63 — charset sniffing + transcoding to UTF-8. Real crawls are not
UTF-8: ~5% of the live web still declares legacy encodings
(windows-125x, iso-8859-x, shift_jis, gb2312, …), and the digest
pipeline's byte-exact invariant (input_hint: byte-identical extracted
text) only holds if pages are decoded by their ACTUAL charset before
any text-level operator runs. The sniff order is the WHATWG one every
browser implements: byte-order mark → ``<meta charset>`` declaration in
the head → UTF-8 validity → configured fallback (windows-1252 in
browsers; utf-8 here by default because replacement-decoding is the
safer bulk behavior).

Plan shape at 100 TB: the sniff is 100% JVM codegen — BOM tests are
binary-prefix compares, the meta scan regexes a 1024-byte latin-1 peek
(ISO-8859-1 decodes any byte sequence losslessly, so the peek never
throws), and UTF-8 validity is the encode∘decode == input round-trip
(Java replacement-decodes invalid sequences, so re-encoding diverges
exactly when the input was invalid). Zero Python, zero exchanges.
The transcode is the one Python step — an Arrow-batched kernel calling
CPython codecs per row (per-row is inherent: each row may carry a
different charset), errors='replace', unknown labels → fallback.

The DuckDB twin replicates BOM + meta + alias normalization on the
same bytes (CAST(blob AS VARCHAR) keeps ASCII literal, and the meta
region is ASCII by spec); the validity branch is pytest-pinned instead
— DuckDB has no UTF-8 validity probe.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_META_RE = r'(?i)<meta[^>]{0,200}charset\s*=\s*["\']?\s*([A-Za-z0-9_.:-]+)'
# the twin regex for DuckDB's escaped-BLOB form: CAST(BLOB AS VARCHAR)
# escapes quotes as \x22 / \x27, so the optional-quote branch must
# accept those four-char sequences as well
_META_RE_ESC = (
    r"(?i)<meta[^>]{0,300}charset\s*=\s*"
    r"(?:\\x22|\\x27|[\"'])?\s*([A-Za-z0-9_.:-]+)"
)

# WHATWG-style label → canonical name (the subset that matters in
# crawl practice; unknown labels pass through lowercased)
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "cp1252": "windows-1252",
    "windows-1252": "windows-1252",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "euc-kr": "euc-kr",
    "big5": "big5",
    "utf-16": "utf-16",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}


def _canon(label: Column) -> Column:
    low = F.lower(label)
    out = low
    for raw, canon in sorted(_ALIASES.items()):
        out = F.when(low == raw, F.lit(canon)).otherwise(out)
    return out


def sniff_charset(
    bin_col: Column,
    default: str = "utf-8",
    peek_bytes: int = 1024,
    validate_utf8: bool = True,
) -> Column:
    """Charset label for an HTML byte payload: BOM → meta declaration →
    UTF-8 validity → ``default``. Pure JVM expressions."""
    bom2 = F.substring(bin_col, 1, 2)
    bom3 = F.substring(bin_col, 1, 3)
    peek = F.decode(F.substring(bin_col, 1, peek_bytes), "ISO-8859-1")
    meta = F.regexp_extract(peek, _META_RE, 1)
    # is_valid_utf8 accepts binary directly; an encode∘decode round-trip
    # would THROW under ANSI decode on malformed input
    valid_utf8 = F.is_valid_utf8(bin_col)
    out = (
        F.when(bom3 == F.lit(bytearray(b"\xef\xbb\xbf")), F.lit("utf-8"))
        .when(bom2 == F.lit(bytearray(b"\xff\xfe")), F.lit("utf-16le"))
        .when(bom2 == F.lit(bytearray(b"\xfe\xff")), F.lit("utf-16be"))
        .when(meta != "", _canon(meta))
    )
    if validate_utf8:
        out = out.when(valid_utf8, F.lit("utf-8"))
    return out.otherwise(F.lit(default))


def decode_udf(fallback: str = "utf-8"):
    """(bytes, charset) → text, Arrow-batched: CPython codecs with
    errors='replace'; unknown/null labels use ``fallback``. BOM bytes
    are consumed by the matching codec ('utf-8-sig' for the UTF-8 BOM
    so the text never starts with U+FEFF)."""

    @F.pandas_udf(T.StringType())
    def decode(payload: pd.Series, charset: pd.Series) -> pd.Series:
        out = []
        for b, cs in zip(payload, charset):
            if b is None:
                out.append(None)
                continue
            label = (cs or fallback).lower()
            if label == "utf-8" and bytes(b)[:3] == b"\xef\xbb\xbf":
                label = "utf-8-sig"
            try:
                codecs.lookup(label)
            except LookupError:
                label = fallback
            out.append(bytes(b).decode(label, errors="replace"))
        return pd.Series(out)

    return decode


def transcode_html(
    bin_col: Column, default: str = "utf-8", peek_bytes: int = 1024
) -> Column:
    """Sniff + decode in one column expression: UTF-8 text whatever the
    page declared."""
    return decode_udf(default)(bin_col, sniff_charset(bin_col, default, peek_bytes))


def sniff_sql_expr(
    blob_expr: str, default: str = "utf-8", peek_bytes: int = 1024
) -> str:
    """The BOM + meta + alias branches as a DuckDB expression over the
    same bytes (validity branch excluded — see module docstring; gate
    queries must resolve every row via BOM or meta). DuckDB has no BLOB
    slicing, but CAST(BLOB AS VARCHAR) is a lossless escape form (ASCII
    literal, every other byte → ``\\xHH``, backslash doubled), so BOM
    prefixes and the ASCII meta region are matched on the escaped
    string. No peek window — the caller's corpus must keep any
    ``charset=`` token inside the engine peek (``peek_bytes``)."""
    esc = f"CAST({blob_expr} AS VARCHAR)"
    meta = f"regexp_extract({esc}, '{_META_RE_ESC.replace(chr(39), chr(39) * 2)}', 1)"
    alias_case = " ".join(
        f"WHEN '{raw}' THEN '{canon}'"
        for raw, canon in sorted(_ALIASES.items())
    )
    canon = f"(CASE lower({meta}) {alias_case} ELSE lower({meta}) END)"
    return (
        f"CASE WHEN starts_with({esc}, '\\xEF\\xBB\\xBF') THEN 'utf-8' "
        f"WHEN starts_with({esc}, '\\xFF\\xFE') THEN 'utf-16le' "
        f"WHEN starts_with({esc}, '\\xFE\\xFF') THEN 'utf-16be' "
        f"WHEN {meta} <> '' THEN {canon} "
        f"ELSE '{default}' END"
    )

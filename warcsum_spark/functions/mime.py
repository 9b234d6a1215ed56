"""T74 — MIME sniffing by magic bytes + declared-vs-sniffed mismatch.

Servers lie about Content-Type constantly (PDFs served as text/html,
images as octet-stream, gzip'd bodies as text/plain); a crawler that
routes payloads by the DECLARED type feeds binary into the text
pipeline and drops real pages from it. The fix every browser and
archive tool applies is WHATWG-style content sniffing: test the
payload's leading bytes against the magic-number table, fall back to a
text/binary probe. This operator supplies (a) the sniffed type and
(b) the declared-vs-sniffed mismatch flag — the routing signal and the
server-lie signal, both needed next to T63's charset sniff (which
assumes the payload already routed as text).

Plan shape: 100% JVM codegen — binary-prefix compares on
``substring(payload, 1, n)`` against byte literals, one latin-1 peek
for the case-insensitive HTML-tag table (the charset.py technique),
``is_valid_utf8`` for the text/binary fallback. Zero Python, zero
exchanges, stream-liftable like every other map-only gate.

The DuckDB twin replicates the magic table as BLOB-prefix compares and
the tag table on the escaped-VARCHAR form; the UTF-8-validity fallback
branch is pytest-pinned (DuckDB has no validity probe — the charset
precedent).

Reference anchor: no counterpart in the reference engine (it trusts
the WARC Content-Type header, warcsum.c:393–420); §2.12 surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (sniffed type, magic prefix) — tested in order; first match wins.
MAGIC_PREFIXES: list[tuple[str, bytes]] = [
    ("application/pdf", b"%PDF-"),
    ("image/png", b"\x89PNG\r\n\x1a\n"),
    ("image/gif", b"GIF87a"),
    ("image/gif", b"GIF89a"),
    ("image/jpeg", b"\xff\xd8\xff"),
    ("application/gzip", b"\x1f\x8b\x08"),
    ("application/zip", b"PK\x03\x04"),
    ("audio/mpeg", b"ID3"),
]

# WHATWG §7.1 HTML tag table: case-insensitive, each must be followed
# by 0x20 or 0x3E (space or '>'), after leading-whitespace skip
HTML_TAGS = [
    "<!DOCTYPE HTML", "<HTML", "<HEAD", "<SCRIPT", "<IFRAME", "<H1",
    "<DIV", "<FONT", "<TABLE", "<A", "<STYLE", "<TITLE", "<B",
    "<BODY", "<BR", "<P", "<!--",
]

_WS = " \t\n\x0c\r"

# WHATWG "binary data byte": 0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F.
# Valid UTF-8 can still carry these (control chars are legal code
# points — RIFF/WAVE headers decode "cleanly"), so the text fallback
# needs BOTH validity and their absence.
_BINARY_BYTE_RE = "[\\x00-\\x08\\x0B\\x0E-\\x1A\\x1C-\\x1F]"


def _riff_webp(bin_col: Column) -> Column:
    return (F.substring(bin_col, 1, 4) == F.lit(b"RIFF")) & (
        F.substring(bin_col, 9, 4) == F.lit(b"WEBP")
    )


#: WHATWG MIME-sniffing "resource header" size: the spec's probes (tag
#: table, binary-data-byte scan) are defined over the first 1445 bytes
WHATWG_RESOURCE_HEADER = 1445


def sniff_mime(
    bin_col: Column, peek_bytes: int = WHATWG_RESOURCE_HEADER
) -> Column:
    """Sniffed MIME type of a payload: magic table → HTML tag table →
    ``<?xml`` → UTF-8-validity text/binary fallback. Null payloads
    sniff null; empty payloads fall through to text/plain (an empty
    body is trivially valid UTF-8 — the WHATWG result for it).

    Window contract: the tag table and the binary-data-byte probe scan
    the same ``peek_bytes`` window (default = WHATWG's 1445-byte
    resource header, so a binary byte anywhere the spec would see one
    flips the fallback to octet-stream); UTF-8 validity is checked over
    the WHOLE payload — deliberately stricter than the spec, because
    the text/plain verdict routes the full payload into the text
    pipeline, not just its header."""
    peek = F.decode(F.substring(bin_col, 1, peek_bytes), "ISO-8859-1")
    # leading-whitespace skip, then UPPER for the case-insensitive table
    lead = F.upper(
        F.regexp_replace(peek, "^[" + _WS + "]+", "")
    )
    out = F.when(
        F.is_valid_utf8(bin_col) & ~peek.rlike(_BINARY_BYTE_RE),
        F.lit("text/plain"),
    ).otherwise(F.lit("application/octet-stream"))
    out = F.when(F.startswith(lead, F.lit("<?XML")), F.lit("text/xml")).otherwise(out)
    for tag in reversed(HTML_TAGS):
        hit = F.startswith(lead, F.lit(tag + " ")) | F.startswith(
            lead, F.lit(tag + ">")
        )
        out = F.when(hit, F.lit("text/html")).otherwise(out)
    out = F.when(_riff_webp(bin_col), F.lit("image/webp")).otherwise(out)
    for mime, prefix in reversed(MAGIC_PREFIXES):
        out = F.when(
            F.substring(bin_col, 1, len(prefix)) == F.lit(prefix),
            F.lit(mime),
        ).otherwise(out)
    return F.when(bin_col.isNull(), F.lit(None).cast("string")).otherwise(out)


def normalize_declared(declared: Column) -> Column:
    """Declared Content-Type → comparable form: lowercase, parameters
    stripped (``text/html; charset=utf-8`` → ``text/html``), trimmed."""
    return F.trim(F.lower(F.substring_index(declared, ";", 1)))


def mime_mismatch(sniffed: Column, declared: Column) -> Column:
    """True when the sniffed type contradicts the declared one. Takes
    the SNIFFED column (not the payload): re-sniffing inside the
    mismatch would duplicate the ~30-branch CASE in the plan and push
    generated methods past the JIT/codegen size limit — passing the
    alias lets Catalyst keep one copy (CollapseProject refuses to
    inline non-cheap expressions referenced twice). The text/* family
    is compared loosely (text/html sniffed vs text/plain declared is a
    routing no-op, not a server lie); null declared or null sniff →
    null (no evidence)."""
    dec = normalize_declared(declared)
    both_text = F.startswith(sniffed, F.lit("text/")) & F.startswith(
        dec, F.lit("text/")
    )
    return F.when(
        sniffed.isNull() | declared.isNull(), F.lit(None).cast("boolean")
    ).otherwise(~both_text & (sniffed != dec))


def with_mime(
    df: DataFrame,
    bin_col: str = "payload",
    declared_col: str | None = None,
) -> DataFrame:
    """Input columns + ``sniffed`` (and ``mime_mismatch`` when a
    declared-type column is given) — the compose-ready form; the sniff
    is computed once and the mismatch reads the alias."""
    out = df.withColumn("sniffed", sniff_mime(F.col(bin_col)))
    if declared_col is not None:
        out = out.withColumn(
            "mime_mismatch",
            mime_mismatch(F.col("sniffed"), F.col(declared_col)),
        )
    return out

"""T59 — Unicode text canonicalization: NFC normalization, control /
zero-width stripping, whitespace collapse, optional accent folding.
This is the step every dedup hash runs AFTER — 'café' composed and
'café' decomposed are the same page, but md5/minhash/simhash see
different bytes until the text is canonical (CCNet normalizes before
hashing for exactly this reason; the reference's byte-exact digests,
warcsum.c:660–700, are on raw payloads — text-level dedup needs the
text-level canonical form).

Plan shape at 100 TB: NFC is the ONLY Python step — one Arrow-batched
kernel (pandas ``str.normalize``, i.e. CPython's unicodedata NFC over
Arrow batches; there is no JVM NFC exposed through pyspark.sql
functions). Everything else (control strip, zero-width strip,
whitespace collapse, trim) is codegen'd JVM regexp_replace layered on
the kernel output, and accent folding is NFD in the same kernel plus a
JVM combining-mark strip. Map-only: zero exchanges, one
ArrowEvalPython.

Engine-portability: DuckDB's ``nfc_normalize`` implements the same
Unicode standard, so ``normalize_oracle_sql`` reproduces the column
exactly with nfc_normalize + the same regex classes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# C0 controls (minus \t\n\r which are whitespace-collapsed later), DEL,
# and the zero-width/joiner/BOM family that survives NFC
_CONTROLS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]"
# combining-mark blocks (what NFD exposes for folding): base diacritics,
# extended, supplement, symbols, half marks
_COMBINING = "[\\u0300-\\u036f\\u1ab0-\\u1aff\\u1dc0-\\u1dff\\u20d0-\\u20ff\\ufe20-\\ufe2f]"
# the same control class in RE2 syntax (DuckDB): RE2 has no \uXXXX —
# codepoints above \x7f must be written \x{...}
_CONTROLS_RE2 = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
    "\\x{200b}\\x{200c}\\x{200d}\\x{feff}]"
)


def _nfc_udf(form: str):
    @F.pandas_udf(T.StringType())
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return nfc


def normalize_text(
    col: Column,
    accent_fold: bool = False,
    collapse_ws: bool = True,
) -> Column:
    """Canonical text: NFC (or NFD + combining-strip when
    ``accent_fold``), controls and zero-widths removed, whitespace runs
    collapsed to single spaces, trimmed."""
    out = _nfc_udf("NFD" if accent_fold else "NFC")(col)
    if accent_fold:
        # NFD exposed the marks; strip them, then NFC-recompose what's
        # left (recomposition is identity for pure-ASCII remainders but
        # keeps non-Latin scripts canonical)
        out = _nfc_udf("NFC")(F.regexp_replace(out, _COMBINING, ""))
    out = F.regexp_replace(out, _CONTROLS, "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def normalize_sql_expr(
    expr: str,
    accent_fold: bool = False,
    collapse_ws: bool = True,
) -> str:
    """The same canonicalization as a DuckDB expression (nfc_normalize /
    strip_accents implement the same Unicode tables) — exact twin for
    the driver oracle."""
    if accent_fold:
        # strip_accents == NFD + combining-mark drop for decomposable
        # chars (pinned in tests); non-decomposable letters (ø, đ) pass
        # through unchanged on BOTH engines
        out = f"nfc_normalize(strip_accents(nfc_normalize({expr})))"
    else:
        out = f"nfc_normalize({expr})"
    out = f"regexp_replace({out}, '{_CONTROLS_RE2}', '', 'g')"
    if collapse_ws:
        out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    return out

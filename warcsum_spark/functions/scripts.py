"""Unicode script profiling — per-document character counts and
fractions for the major writing systems, plus a dominant-script guess.
The cheap, deterministic companion to the n-gram lang-ID in
functions/text.py: script tells you "this is CJK/Cyrillic/Arabic text"
before any language model runs, routes documents to script-specific
tokenizers, and catches mojibake (no dominant script) early.

Engine portability: Java regex spells scripts ``\\p{IsLatin}`` while
RE2 (the DuckDB oracle) spells them ``\\p{Latin}`` — NOT a common
subset — so every class below is written as explicit ``\\x{...}``
code-point ranges, which both engines parse identically. Ranges cover
the primary BMP blocks of each script (not exhaustive Unicode script
property sets — documented approximation, same tradeoff as the lang-ID
marker lists).

All counts are single ``regexp_count`` passes — codegen'd JVM,
map-only, SQL-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit BMP ranges: identical meaning under java.util.regex and RE2
SCRIPT_RANGES = {
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "arabic": r"[\x{0600}-\x{06FF}\x{0750}-\x{077F}]",
    "hebrew": r"[\x{0590}-\x{05FF}]",
    "devanagari": r"[\x{0900}-\x{097F}]",
    "hangul": r"[\x{1100}-\x{11FF}\x{AC00}-\x{D7AF}]",
    "cjk": r"[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}]",
}


def script_counts(text: Column) -> dict[str, Column]:
    """{script: count of characters in that script's ranges}."""
    return {
        # coalesce: null text counts as zero everywhere (guess 'und'),
        # not a null that would poison the argmax comparisons
        name: F.coalesce(F.regexp_count(text, F.lit(cls)), F.lit(0)).cast("long")
        for name, cls in SCRIPT_RANGES.items()
    }


def _argmax_script(scores: dict[str, Column]) -> Column:
    best = None
    for name in sorted(scores):  # ASC order makes '>' ties resolve to first
        s = scores[name]
        if best is None:
            best = (s, F.lit(name))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(name)).otherwise(best[1]),
            )
    score, name = best
    return F.when(score <= 0, F.lit("und")).otherwise(name)


def with_script_profile(
    df: DataFrame, text_col: str = "text", prefix: str = "script_"
) -> DataFrame:
    """+ per-script counts (``script_<name>``), the scripted-character
    fraction of the total length, and ``script_guess`` (dominant script,
    ties to the alphabetically first, 'und' when no scripted chars —
    numbers/punctuation-only or empty/null docs)."""
    counts = script_counts(F.col(text_col))
    staged = df.withColumns({f"{prefix}{k}": v for k, v in counts.items()})
    staged_cols = {k: F.col(f"{prefix}{k}") for k in counts}
    total_scripted = None
    for k in staged_cols:
        total_scripted = (
            staged_cols[k]
            if total_scripted is None
            else total_scripted + staged_cols[k]
        )
    frac = F.round(
        total_scripted
        / F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double"),
        6,
    )
    return staged.withColumn(
        f"{prefix}char_frac", F.coalesce(frac, F.lit(0.0))
    ).withColumn(f"{prefix}guess", _argmax_script(staged_cols))

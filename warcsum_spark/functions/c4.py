"""T82 — C4-style line-level cleaning battery (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning" §2.2: the rule set that
produced C4 from Common Crawl).

Positioning vs. the neighbouring passes: the Gopher battery
(functions/quality.py, T13) *scores whole documents* and filters them;
this pass *rewrites* documents line by line and then flags the page —
the two halves of C4's published recipe that the Gopher rules do not
cover. T81 (operators/line_dedup.py) removes a line because it repeats
*within* the document; this pass removes a line because of what the
line itself looks like. C4's remaining rule — three-sentence-span
dedup — is corpus-wide and already owned by T49
(operators/span_dedup.py).

Line rules (a line survives iff ALL hold, evaluated on the line with
trailing ``[ \\t\\r]`` stripped):

* ends in a terminal punctuation mark (``.`` ``!`` ``?`` ``"``) —
  C4's "retained only lines that ended in a terminal punctuation
  mark";
* contains at least 3 whitespace-separated words — C4's "only
  retained lines that contained at least 3 words";
* does not contain the word "javascript" (case-insensitive) — C4's
  "removed any line with the word Javascript".

Page rules (flags + composite ``keep_page``, over the ORIGINAL text
for the substring probes and the CLEANED text for the sentence count,
matching C4's order: line filtering first, then page filtering):

* at least 5 sentences — sentence count defined as the number of
  ``.`` / ``!`` / ``?`` characters in the cleaned text (a deliberate,
  documented simplification: C4 used a sentence splitter; a character
  count is the engine-portable deterministic stand-in, computed with
  replace-length arithmetic identically in Spark and DuckDB);
* no "lorem ipsum" (case-insensitive) anywhere on the page;
* no curly brace ``{`` anywhere on the page (probed on the raw text);
* no blocklisted word (C4 used the public "List of Dirty, Naughty,
  Obscene..." list; the engine takes the list as a parameter and ships
  a tiny placeholder default — the list is a policy artifact, not an
  algorithm).

The "lorem ipsum" and blocklist probes run over the
whitespace-NORMALIZED lowercased page (functions/quality.py::_norm,
the stopword-probe precedent) so markers split across newlines/tabs
still match their space-padded forms.

Spark-first plan: **zero exchanges, zero UDFs** — the line filter is a
row-local ``filter(lines, l -> …)`` higher-order expression and every
page probe is ``contains``/replace arithmetic, all inside whole-stage
codegen; the operator streams through a 10^10-row corpus with no
shuffle and the text never leaves its partition. Regexes stay inside
the RE2 ∩ java.util.regex common subset (explicit ``[ \\t]`` classes,
no ``\\s``, no lookaround) so the driver's DuckDB oracle re-evaluates
the IDENTICAL patterns.

Reference anchor: the reference (warcsum.c) normalizes and digests
whole payloads; content-quality rewriting is §2.12 training-data
surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcsum_spark.functions.quality import _norm
from warcsum_spark.functions.text import _count_occurrences

# trailing-whitespace strip applied before the terminal-punct probe;
# explicit class (no \s): Java's \s has \x0b, RE2's does not
TRAIL_WS_RE = r"[ \t\r]+$"
# line ends in . ! ? or a closing double quote (C4's terminal set)
TERMINAL_RE = r'[.!?"]$'
# >= 3 whitespace-separated words: token, gap, token, gap, token
THREE_WORDS_RE = r"[^ \t]+[ \t]+[^ \t]+[ \t]+[^ \t]"

# placeholder for C4's "Dirty, Naughty, Obscene" blocklist — matched as
# whole words over the space-padded lowercased page
DEFAULT_BLOCKLIST = ("obscenityone", "obscenitytwo")

MIN_SENTENCES = 5


def _line_keep(line: Column) -> Column:
    """The C4 line predicate on ONE line (already \\n-split)."""
    stripped = F.regexp_replace(line, TRAIL_WS_RE, "")
    return (
        stripped.rlike(TERMINAL_RE)
        & stripped.rlike(THREE_WORDS_RE)
        & ~F.contains(F.lower(stripped), F.lit("javascript"))
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    min_sentences: int = MIN_SENTENCES,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, carry..., n_lines, n_kept, clean_text, n_sentences,
    has_lorem_ipsum, has_brace, blockword_hits, keep_page): apply C4's
    line filter, rewrite the text from the surviving lines (original
    order), then evaluate C4's page-level rules."""
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    kept = F.filter("_lines", _line_keep)
    staged = staged.select(
        id_col,
        *carry_cols,
        "_text",
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    # whole-word probes run over the whitespace-NORMALIZED lowercased
    # page (the quality.py stopword precedent) so words separated by
    # newlines/tabs still match the space-padded markers
    lower_padded = F.concat(
        F.lit(" "), F.lower(_norm(F.col("_text"))), F.lit(" ")
    )
    n_sentences = sum(
        _count_occurrences(F.col("clean_text"), m) for m in (".", "!", "?")
    ).cast("long")
    blockword_hits = sum(
        F.when(_count_occurrences(lower_padded, f" {w} ") > 0, 1).otherwise(0)
        for w in blocklist
    ).cast("int")
    flagged = staged.withColumns(
        {
            "n_sentences": n_sentences,
            "has_lorem_ipsum": F.contains(lower_padded, F.lit("lorem ipsum")),
            "has_brace": F.contains("_text", F.lit("{")),
            "blockword_hits": blockword_hits,
        }
    )
    return flagged.withColumn(
        "keep_page",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace")
        & (F.col("blockword_hits") == 0),
    ).drop("_text")

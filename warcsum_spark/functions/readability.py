"""T89 — readability battery: Flesch Reading Ease, Flesch–Kincaid
grade (Kincaid et al. 1975, the Navy re-fit of Flesch 1948), and the
Gunning fog index (Gunning 1952).

Why a crawl/training-data engine wants these: readability is a cheap,
language-intrinsic quality axis that the existing batteries do not
cover — T13 (Gopher) gates on length/symbol/stopword shape, T66 on
entropy, T39/T78 on LM perplexity. Readability scores separate
listicle/SEO sludge from expository prose at essentially zero cost and
are standard columns in published corpus audits (e.g. C4/Dolma corpus
datasheets report Flesch distributions); mixture recipes bucket on
them the same way CCNet buckets on perplexity.

Pinned, engine-portable definitions (variants abound; these are chosen
so Spark and the DuckDB oracle evaluate IDENTICAL expression trees):

* words: lowercase the text, collapse ``[^a-z]+`` runs to one space,
  trim — the tagging.py/entropy.py letters-only normalization. A word
  is a maximal letter run ("don't" counts as two words, pinned).
* sentences: the number of ``.`` / ``!`` / ``?`` characters in the RAW
  text, computed with replace-length arithmetic (the c4.py sentence
  precedent — exact integers on any engine). Ratios use
  ``max(1, n_sentences)`` so fragment-only docs don't divide by zero.
* syllables per word: the number of maximal vowel-group runs
  ``[aeiouy]+``, minus one when the word ends in ``e`` and has at
  least two runs (the classic silent-e correction), floored at 1.
  Vowel-run counting is the double-replace trick — replace each run
  with one sentinel char vs with nothing; the length difference IS the
  run count — so the whole battery stays inside exact integer
  arithmetic until the three final divisions.
* complex word: ≥ 3 syllables (Gunning's "hard word", without his
  proper-noun/compound exemptions — those need a parser; pinned).

Scores (each division/multiplication written ONCE, identical
association on both engines, rounded to 6 at output; NULL when the
document has no words):

* ``flesch_reading_ease = 206.835 − 1.015·(words/sentences)
  − 84.6·(syllables/words)``
* ``fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words)
  − 15.59``
* ``gunning_fog = 0.4·(words/sentences + 100·(complex/words))``

Spark-first plan: **zero exchanges, zero UDFs** — the per-word
syllable map is a row-local ``transform`` + ``aggregate`` higher-order
expression over the split array, counts are replace-length arithmetic,
everything inside whole-stage codegen; the operator streams through a
10^10-row corpus with no shuffle and the text never leaves its
partition (stateless projection, Structured-Streaming liftable).

No reference counterpart (warcsum has no text-quality operators);
formulas are the published readability literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: vowel class for syllable runs — y counts as a vowel (pinned)
VOWEL_RUN = "[aeiouy]+"
#: sentinel for the run-count double-replace; never appears in the
#: letters-only normalized words
_RUN_MARK = "#"


def _letters_norm(text: Column) -> Column:
    """lowercase, collapse non-letter runs to one space, trim — the
    tagging.py/entropy.py normalization restricted to letters."""
    s = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), "[^a-z]+", " ")
    return F.regexp_replace(s, "^ +| +$", "")


def _char_count(text: Column, ch: str) -> Column:
    """exact occurrences of one literal char via replace-length."""
    return F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))


def _syllables(w: Column) -> Column:
    """pinned per-word syllable count (see module docstring)."""
    runs = F.length(F.regexp_replace(w, VOWEL_RUN, _RUN_MARK)) - F.length(
        F.regexp_replace(w, VOWEL_RUN, "")
    )
    silent_e = F.when(F.endswith(w, F.lit("e")) & (runs >= 2), 1).otherwise(0)
    return F.greatest(F.lit(1), runs - silent_e)


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """(id..., n_words, n_sentences, n_syllables, n_complex_words,
    flesch_reading_ease, fk_grade, gunning_fog) — map-only, zero
    exchanges, zero Python. Scores are NULL for wordless documents."""
    ids = id_cols if id_cols is not None else [
        c for c in df.columns if c != text_col
    ]
    raw = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        *ids,
        _letters_norm(F.col(text_col)).alias("__norm"),
        (
            _char_count(raw, ".") + _char_count(raw, "!")
            + _char_count(raw, "?")
        ).cast("long").alias("n_sentences"),
    )
    norm = F.col("__norm")
    words = F.split(norm, " ")
    syls = F.transform(words, _syllables)
    zero = F.lit(0).cast("long")
    counted = staged.select(
        *ids,
        F.when(norm == "", zero)
        .otherwise(F.size(words).cast("long"))
        .alias("n_words"),
        F.col("n_sentences"),
        F.when(norm == "", zero)
        .otherwise(
            F.aggregate(syls, zero, lambda acc, x: acc + x.cast("long"))
        )
        .alias("n_syllables"),
        F.when(norm == "", zero)
        .otherwise(
            F.aggregate(
                F.transform(
                    syls,
                    lambda s: F.when(s >= 3, F.lit(1)).otherwise(F.lit(0)),
                ),
                zero,
                lambda acc, x: acc + x.cast("long"),
            )
        )
        .alias("n_complex_words"),
    )
    w = F.col("n_words").cast("double")
    wps = w / F.greatest(F.lit(1), F.col("n_sentences")).cast("double")
    spw = F.col("n_syllables").cast("double") / w
    cpw = F.col("n_complex_words").cast("double") / w
    has_words = F.col("n_words") > 0
    return counted.select(
        *ids,
        "n_words",
        "n_sentences",
        "n_syllables",
        "n_complex_words",
        F.when(
            has_words,
            F.round(
                F.lit(206.835) - (F.lit(1.015) * wps) - (F.lit(84.6) * spw),
                6,
            ),
        ).alias("flesch_reading_ease"),
        F.when(
            has_words,
            F.round(
                ((F.lit(0.39) * wps) + (F.lit(11.8) * spw)) - F.lit(15.59), 6
            ),
        ).alias("fk_grade"),
        F.when(
            has_words,
            F.round(F.lit(0.4) * (wps + (F.lit(100.0) * cpw)), 6),
        ).alias("gunning_fog"),
    )


def readability_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The IDENTICAL expression trees for DuckDB — generated from the
    same pinned constants so the engines can only agree by computing
    the same battery."""
    raw = f"coalesce({text_col}, '')"
    norm = (
        f"trim(regexp_replace(lower({raw}), '[^a-z]+', ' ', 'g'))"
    )

    def cnt(expr: str, ch: str) -> str:
        return f"(length({expr}) - length(replace({expr}, '{ch}', '')))"

    syl = (
        "greatest(1, (length(regexp_replace(w, '[aeiouy]+', '#', 'g'))"
        " - length(regexp_replace(w, '[aeiouy]+', '', 'g')))"
        " - (CASE WHEN ends_with(w, 'e')"
        " AND (length(regexp_replace(w, '[aeiouy]+', '#', 'g'))"
        " - length(regexp_replace(w, '[aeiouy]+', '', 'g'))) >= 2"
        " THEN 1 ELSE 0 END))"
    )
    return f"""
WITH staged AS (
  SELECT {id_col}, {norm} AS nrm,
    CAST({cnt(raw, '.')} + {cnt(raw, '!')} + {cnt(raw, '?')} AS BIGINT)
      AS n_sentences
  FROM {docs_table}
), syl AS (
  SELECT {id_col}, n_sentences,
    CASE WHEN nrm = '' THEN CAST(0 AS BIGINT)
         ELSE CAST(len(string_split(nrm, ' ')) AS BIGINT) END AS n_words,
    CASE WHEN nrm = '' THEN CAST(0 AS BIGINT)
         ELSE CAST(list_sum(list_transform(string_split(nrm, ' '),
                                           w -> {syl})) AS BIGINT)
    END AS n_syllables,
    CASE WHEN nrm = '' THEN CAST(0 AS BIGINT)
         ELSE CAST(list_sum(list_transform(string_split(nrm, ' '),
              w -> CASE WHEN {syl} >= 3 THEN 1 ELSE 0 END)) AS BIGINT)
    END AS n_complex_words
  FROM staged
)
SELECT {id_col}, n_words, n_sentences, n_syllables, n_complex_words,
  CASE WHEN n_words > 0 THEN round(
    206.835 - (1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(greatest(1, n_sentences) AS DOUBLE)))
            - (84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(n_words AS DOUBLE))), 6)
  END AS flesch_reading_ease,
  CASE WHEN n_words > 0 THEN round(
    ((0.39 * (CAST(n_words AS DOUBLE)
              / CAST(greatest(1, n_sentences) AS DOUBLE)))
     + (11.8 * (CAST(n_syllables AS DOUBLE)
                / CAST(n_words AS DOUBLE)))) - 15.59, 6)
  END AS fk_grade,
  CASE WHEN n_words > 0 THEN round(
    0.4 * ((CAST(n_words AS DOUBLE)
            / CAST(greatest(1, n_sentences) AS DOUBLE))
           + (100.0 * (CAST(n_complex_words AS DOUBLE)
                       / CAST(n_words AS DOUBLE)))), 6)
  END AS gunning_fog
FROM syl
"""

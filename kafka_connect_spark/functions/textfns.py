"""Text-analysis column functions (SURVEY.md §2.6 X14 + training-data
pipeline ops): tokenization, quality scoring, language-ID heuristic,
document fingerprinting.

All pure JVM-side expressions (split / higher-order array functions) — no
Python UDF in the hot path, so these stay inside whole-stage codegen and
scale linearly with input splits."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopword sets for the language-ID heuristic. Deterministic and
# mirrored verbatim in the DuckDB oracle SQL (queries/text.py).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "los", "que", "y", "es", "una"],
    "fr": ["le", "les", "et", "des", "une", "est"],
}

STOPWORDS = ["a", "the", "of", "and", "to", "in"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (matches DuckDB string_split(text, ' '))."""
    return F.split(text if isinstance(text, Column) else F.col(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def _stopword_ratio_raw(toks: Column) -> Column:
    return _hits(toks, STOPWORDS) / F.size(toks)


def _punct_ratio_raw(t: Column) -> Column:
    return F.length(F.regexp_replace(t, "[^.,!?;:]", "")) / F.length(t)


def stopword_ratio(text: Column | str) -> Column:
    return F.round(_stopword_ratio_raw(tokens(text)), 6)


def punct_ratio(text: Column | str) -> Column:
    t = text if isinstance(text, Column) else F.col(text)
    return F.round(_punct_ratio_raw(t), 6)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: long-enough docs with a healthy
    stopword ratio and low punctuation density score high. Single final
    round (4 dp) over unrounded ratios — nesting rounds amplifies
    engine-level ulp differences and breaks cross-engine hash checks."""
    t = text if isinstance(text, Column) else F.col(text)
    n = token_count(t)
    len_score = F.least(n, F.lit(100)) / 100.0
    stop_score = F.least(_stopword_ratio_raw(tokens(t)) * 5, F.lit(1.0))
    punct_pen = _punct_ratio_raw(t)
    return F.round((len_score + stop_score) / 2.0 - punct_pen, 4)


def lang_id(text: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic: count marker-token hits per
    language; argmax in fixed (en, de, es, fr) priority order; no hits =>
    'und'. (A real pipeline swaps in fastText/CLD3 via a pandas UDF — the
    operator contract is the same column-in/column-out.)"""
    toks = tokens(text)
    hits = {lang: _hits(toks, words) for lang, words in LANG_MARKERS.items()}
    en, de, es, fr = hits["en"], hits["de"], hits["es"], hits["fr"]
    return (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= es) & (de >= fr) & (de > 0), F.lit("de"))
        .when((es >= fr) & (es > 0), F.lit("es"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set of the lowercased text. Two docs with permuted wording share a
    fingerprint — the cheap first-pass bucket key for dedup."""
    t = text if isinstance(text, Column) else F.col(text)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(t), " "))))
    return F.md5(canon)


def add_text_stats(df, text_col: str = "text"):
    """Convenience: attach the full stat column family."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fp", fingerprint(t))
    )

"""Text-analysis operators for large-scale corpus processing.

All pure JVM-side column expressions (whole-stage-codegen'd, no Python in
the hot path) — at 100 TB these run at parquet-scan speed. Each has an
exact DuckDB-SQL rendering used by the oracle queries in
``plans/extensions.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language heuristic.
# Deliberately tiny: language ID at corpus scale is a scoring heuristic, not
# a model; the operator shape (vector of marker-hit counts → argmax) is what
# scales, the lists are swappable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "los", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum non-space.
# Portable between Java regex (Spark) and RE2 (DuckDB).
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def normalize(col: Column) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col: Column) -> Column:
    """Split normalized text into words (single-space delimited)."""
    return F.split(normalize(col), " ")


def token_count(col: Column) -> Column:
    """Count BPE-ish tokens (letter runs / digit runs / punctuation marks)."""
    return F.regexp_count(normalize(col), F.lit(TOKEN_PATTERN))


def marker_hits(words_col: Column, markers: list[str]) -> Column:
    """How many word tokens belong to a marker set (stopword-count style).

    ``words_col`` must be a materialized array column (see the staging
    note on :func:`quality_stats`).
    """
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words_col, lambda w: F.array_contains(lit_markers, w)))


def lang_scores(words_col: Column) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    return {lang: marker_hits(words_col, ms) for lang, ms in LANG_MARKERS.items()}


def lang_guess(words_col: Column) -> Column:
    """Argmax over marker hits with deterministic precedence en>es>de>fr;
    'und' when nothing matches."""
    s = lang_scores(words_col)
    best = F.greatest(*s.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = precedence
        out = out.when(s[lang] == best, F.lit(lang))
    return out


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    The rolling-hash/winnowing variant is in dedup.py; this exact-hash form
    is the join key for exact dedup at any scale (hash-partitionable).
    """
    return F.md5(normalize(col))


def quality_stats(words_col: Column) -> dict[str, Column]:
    """Heuristic quality-scoring features: word count, distinct ratio,
    mean word length, stopword ratio. All exact-arithmetic portable.

    PERFORMANCE: ``words_col`` must be a *named, materialized* column
    (``df.withColumn("w", words(col))``), not an inline split expression —
    expressions referenced inside higher-order-function lambdas are
    re-evaluated per element, turning these stats quadratic per document.
    """
    w = words_col
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    total_word_chars = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_hits = marker_hits(w, LANG_MARKERS["en"])
    return {
        "n_words": n_words,
        "distinct_ratio": n_distinct.cast("double") / n_words,
        "mean_word_len": total_word_chars.cast("double") / n_words,
        "stopword_ratio": stop_hits.cast("double") / n_words,
    }

"""Text-analysis operators for large-scale corpus processing.

All pure JVM-side column expressions (whole-stage-codegen'd, no Python in
the hot path) — at 100 TB these run at parquet-scan speed. Each has an
exact DuckDB-SQL rendering used by the oracle queries in
``plans/extensions.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def bigrams(words_col: Column) -> Column:
    """All word 2-grams WITH multiplicity (unlike dedup.word_shingles,
    which distincts — repetition measurement needs the duplicates)."""
    w = words_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)))
    return F.when(F.size(w) >= 2, grams) \
            .otherwise(F.array().cast("array<string>"))


def repetition_stats(staged: DataFrame, id_col: str,
                     words_col: str) -> DataFrame:
    """Per-document repetition features (the Gopher-rule repetition family:
    Rae et al. 2021, "Scaling Language Models", Table A1 — adapted from
    lines to tokens since corpus text here is newline-free):

    - ``top_word_frac``: occurrences of the most frequent word / n_words
    - ``dup_2gram_frac``: fraction of 2-gram instances whose 2-gram occurs
      more than once in the document

    ``staged`` must carry a MATERIALIZED words array column (the HOF
    staging rule). Shape: explode → per-(doc, gram) count → per-doc fold;
    both shuffles key on (doc, gram), so the work distributes by document
    and never concentrates — at 100 TB this is scan-shaped.
    """
    doc = F.col(id_col)
    uni = (staged.select(doc.alias("doc"),
                         F.explode(F.col(words_col)).alias("g"))
           .groupBy("doc", "g").agg(F.count(F.lit(1)).alias("n"))
           .groupBy("doc")
           .agg(F.max("n").alias("top_word_n"),
                F.sum("n").alias("n_words_rep")))
    bg = (staged.select(doc.alias("doc"),
                        F.explode(bigrams(F.col(words_col))).alias("g"))
          .groupBy("doc", "g").agg(F.count(F.lit(1)).alias("n"))
          .groupBy("doc")
          .agg(F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(F.lit(0)))
                .alias("dup_2gram_n"),
               F.sum("n").alias("n_2grams")))
    return (uni.join(bg, "doc", "left")
            .select("doc",
                    (F.col("top_word_n").cast("double")
                     / F.col("n_words_rep")).alias("top_word_frac"),
                    F.coalesce(F.col("dup_2gram_n").cast("double")
                               / F.col("n_2grams"), F.lit(0.0))
                     .alias("dup_2gram_frac")))


def sql_repetition_stats(table: str, id_col: str, text_col: str) -> str:
    """DuckDB rendering of :func:`repetition_stats` over ``normalize``d
    text (identical grouping arithmetic; count/count division of identical
    integers is bit-identical across engines)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    WITH __w AS (SELECT {id_col} AS doc,
                        string_split({norm}, ' ') AS w FROM {table}),
    __uni AS (
      SELECT doc, MAX(n) AS top_word_n, SUM(n) AS n_words_rep
      FROM (SELECT doc, g, COUNT(*) AS n
            FROM (SELECT doc, unnest(w) AS g FROM __w)
            GROUP BY doc, g)
      GROUP BY doc),
    __bg AS (
      SELECT doc,
             SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_2gram_n,
             SUM(n) AS n_2grams
      FROM (SELECT doc, g, COUNT(*) AS n
            FROM (SELECT doc,
                         unnest(CASE WHEN len(w) >= 2 THEN list_transform(
                             generate_series(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i + 1])
                           ELSE [] END) AS g
                  FROM __w)
            GROUP BY doc, g)
      GROUP BY doc)
    SELECT __uni.doc,
           CAST(top_word_n AS DOUBLE) / n_words_rep AS top_word_frac,
           COALESCE(CAST(dup_2gram_n AS DOUBLE) / n_2grams, 0.0)
             AS dup_2gram_frac
    FROM __uni LEFT JOIN __bg ON __uni.doc = __bg.doc
    """


def vocab_topk(df, text_col: str, k: int = 100):
    """Top-k corpus vocabulary by term frequency — the fixture-statistics
    pass (vocabulary coverage, tokenizer fitting, stopword discovery) of a
    training-data pipeline.

    Scale shape: explode → partial count per partition (map-side combine)
    → one shuffle on the term → TakeOrderedAndProject for the global
    top-k. Term cardinality, not corpus size, bounds the shuffle.
    """
    from pyspark.sql import functions as F

    from fictional_guacamole_spark.tables import fan_out

    staged = fan_out(df.select(F.col(text_col).alias("__t"))) \
        .select(F.split(normalize(F.col("__t")), " ").alias("__w"))
    terms = staged.select(F.explode("__w").alias("word")) \
                  .filter(F.col("word") != "")
    return (terms.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("word"))
            .limit(k))


def sql_vocab_topk(table: str, text_col: str, k: int = 100) -> str:
    """DuckDB replay of :func:`vocab_topk` (same normalization)."""
    norm = (f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))")
    return f"""
    SELECT word, COUNT(*) AS n_occurrences
    FROM (SELECT unnest(string_split({norm}, ' ')) AS word FROM {table})
    WHERE word <> ''
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT {k}
    """

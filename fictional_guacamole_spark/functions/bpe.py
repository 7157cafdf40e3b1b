"""Real byte-pair-encoding subword tokenizer — distributed trainer + encoder.

Upgrades the package's "BPE-ish regex" token counting (``text.py``,
``TOKEN_PATTERN``) to the actual BPE algorithm of Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL 2016):
start from characters, repeatedly count adjacent symbol pairs across the
corpus vocabulary and merge the most frequent pair, yielding a learned
subword inventory. This is the tokenizer shape every LLM training corpus is
measured in; the reference app (a market-data ETL) has no counterpart — the
operator belongs to the LLM-data-pipeline mandate.

Distributed shape (the part that must survive 100 TB):

- The corpus is touched EXACTLY ONCE — a word-frequency groupBy (map-side
  combined, one shuffle keyed by word). Everything after operates on the
  *distinct-word vocabulary*, which is corpus-size-bounded by Heaps' law
  (tens of millions of rows at web scale, kilobytes per row) — a table, not
  "the data".
- Each merge round is one vocab-sized aggregation (explode adjacent symbol
  pairs → groupBy pair → weighted count) plus a **1-row** ``limit(1)
  .collect()`` for the argmax — the same bounded-collect discipline as the
  ANN trainers (similarity.py). Rounds are bounded by ``n_merges``.
- The merge application is a pure JVM ``replace`` column expression over the
  vocab (no Python, no shuffle). Each round's vocab is localCheckpoint-ed
  (materialized + lineage severed) so round k analyzes and computes a
  one-replace-deep plan, never rounds 1..k-1; on a real cluster this is a
  per-round reliable ``checkpoint`` of a vocab-sized table.
- Encoding never re-runs BPE per document: documents explode to words and
  equi-join the trained vocab (broadcastable at any realistic vocab size;
  Catalyst/AQE picks the strategy if the hint is dropped), so the corpus is
  again touched once, with one word-keyed shuffle for the per-doc rollup.

Symbol-string representation (shared with the DuckDB oracle renderings so
the value hashes are exact):

    repr(word) = ' ' + '  '.join(symbols) + ' '

— double space BETWEEN symbols, single-space sentinels at the ends. Symbols
never contain spaces, so the literal pattern ``' a  b '`` can only match at
symbol boundaries, and because each replacement re-emits both sentinel
spaces the invariant survives ``replace`` (consecutive occurrences like
``' a  b  a  b '`` both merge in one pass). Java ``String.replace`` (Spark),
DuckDB ``replace`` and Python ``str.replace`` all scan left-to-right over
the source without rescanning replacements — exactly greedy BPE merge
semantics (verified by property tests in tests/test_bpe.py against a
pure-Python reference implementation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fictional_guacamole_spark.functions.text import words

# Impossible-symbol sentinel for the SQL oracle's COALESCE guard: if a merge
# round finds no pair (degenerate corpora), the scalar subquery is NULL and
# replace() must become a no-op rather than poison the column.
_NEVER = "chr(1)"


def char_repr(col: Column) -> Column:
    """``' a  b  c '`` spaced-symbol representation of a word's characters."""
    return F.concat(F.lit(" "),
                    F.trim(F.regexp_replace(col, "(.)", "$1  ")),
                    F.lit(" "))


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word frequency table ``(w, freq, r)`` — the one corpus pass."""
    return (df.select(F.explode(words(F.col(text_col))).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
            .withColumn("r", char_repr(F.col("w"))))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-symbol-pair counts over the vocab table."""
    return (vocab
            .select("freq", F.split(F.trim("r"), "  ").alias("s"))
            .select("freq", F.explode(F.expr(
                "transform(slice(s, 1, size(s) - 1),"
                " (x, i) -> struct(x AS a, s[i + 1] AS b))")).alias("p"))
            .groupBy(F.col("p.a").alias("left_sym"),
                     F.col("p.b").alias("right_sym"))
            .agg(F.sum("freq").cast("long").alias("pair_count")))


def bpe_train(df: DataFrame, text_col: str,
              n_merges: int) -> tuple[list[tuple[int, str, str, int]],
                                      DataFrame]:
    """Learn ``n_merges`` BPE merges; return (merges, final vocab).

    merges is ``[(merge_rank, left_sym, right_sym, pair_count), ...]`` in
    learned order with the deterministic tie-break (count DESC, then the
    pair lexicographically). The returned vocab ``(w, freq, r)`` carries
    each word's final symbol string — the encoder's join table.
    """
    # localCheckpoint (not persist): materializes AND severs lineage, so
    # round k's plans are one replace deep, not k — the per-round argmax
    # job analyzes a leaf, and dropping the parent cannot trigger
    # recompute. On a real cluster this is a per-round reliable
    # checkpoint of a vocab-sized table.
    vocab = word_vocab(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # Bounded collect: exactly one row per round (argmax of the pair
        # counts), same discipline as the ANN trainers.
        best = (pair_counts(vocab)
                .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
                .limit(1).collect())
        if not best:
            break  # pairs exhausted (every word a single symbol)
        a, b, cnt = (best[0]["left_sym"], best[0]["right_sym"],
                     int(best[0]["pair_count"]))
        merges.append((rank, a, b, cnt))
        vocab = vocab.withColumn(
            "r", F.replace("r", F.lit(f" {a}  {b} "),
                           F.lit(f" {a}{b} "))).localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode_stats(df: DataFrame, id_col: str, text_col: str,
                     vocab: DataFrame) -> DataFrame:
    """Per-document token stats under a trained vocab.

    Documents explode to words and equi-join the vocab's final symbol
    strings — BPE is never re-run per document. Output: ``(doc, n_words,
    n_tokens)`` where n_tokens is the subword count after all merges.
    """
    wtok = vocab.select(
        "w", F.size(F.split(F.trim("r"), "  ")).cast("long")
        .alias("w_tokens"))
    docw = (df.select(F.col(id_col).alias("doc"),
                      F.explode(words(F.col(text_col))).alias("w"))
            .filter(F.length("w") > 0))
    return (docw.join(F.broadcast(wtok), "w")
            .groupBy("doc")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("w_tokens").cast("long").alias("n_tokens")))


# ---------------------------------------------------------------------------
# DuckDB oracle renderings: the SAME algorithm as an n_merges-stage CTE chain
# ---------------------------------------------------------------------------

def _sql_norm(text_col: str) -> str:
    # Identical to text.py's normalize() rendering.
    return f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"


def sql_bpe_ctes(table: str, text_col: str, n_merges: int,
                 where: str = "") -> str:
    """The shared CTE chain: ``__v0`` (char vocab) through ``__v{n}`` (final
    vocab) with per-round pair counts ``__p{k}`` and argmax ``__b{k}``."""
    norm = _sql_norm(text_col)
    cond = f" WHERE {where}" if where else ""
    parts = [f"""
    __v0 AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             ' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS r
      FROM (SELECT unnest(string_split({norm}, ' ')) AS w
            FROM {table}{cond})
      WHERE length(w) > 0
      GROUP BY w)"""]
    for k in range(1, n_merges + 1):
        v = k - 1
        parts.append(f"""
    __p{k} AS MATERIALIZED (
      SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(CASE WHEN len(s) >= 2 THEN list_transform(
                   generate_series(1, len(s) - 1),
                   i -> {{'a': s[i], 'b': s[i + 1]}})
                 ELSE [] END) AS p
        FROM (SELECT freq, string_split(trim(r), '  ') AS s FROM __v{v}))
      GROUP BY 1, 2),
    __b{k} AS MATERIALIZED (SELECT a, b, cnt FROM __p{k}
               ORDER BY cnt DESC, a, b LIMIT 1),
    __v{k} AS MATERIALIZED (
      SELECT w, freq,
             replace(r,
                 ' ' || COALESCE((SELECT a FROM __b{k}), {_NEVER})
                     || '  ' || COALESCE((SELECT b FROM __b{k}), {_NEVER})
                     || ' ',
                 ' ' || COALESCE((SELECT a FROM __b{k}), {_NEVER})
                     || COALESCE((SELECT b FROM __b{k}), {_NEVER})
                     || ' ') AS r
      FROM __v{v})""")
    return ",".join(parts)


def sql_bpe_train(table: str, text_col: str, n_merges: int,
                  where: str = "") -> str:
    """DuckDB rendering of :func:`bpe_train`'s merge table."""
    ctes = sql_bpe_ctes(table, text_col, n_merges, where)
    rows = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, cnt AS pair_count FROM __b{k}"
        for k in range(1, n_merges + 1))
    return f"""
    WITH {ctes}
    SELECT * FROM (
      {rows})
    ORDER BY merge_rank
    """


def sql_bpe_encode_stats(table: str, id_col: str, text_col: str,
                         n_merges: int, where: str = "") -> str:
    """DuckDB rendering of train-then-encode per-document token stats."""
    ctes = sql_bpe_ctes(table, text_col, n_merges, where)
    norm = _sql_norm(text_col)
    cond = f" WHERE {where}" if where else ""
    return f"""
    WITH {ctes},
    __wtok AS (
      SELECT w, CAST(len(string_split(trim(r), '  ')) AS BIGINT) AS w_tokens
      FROM __v{n_merges})
    SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_tokens) AS BIGINT) AS n_tokens
    FROM (SELECT {id_col} AS doc,
                 unnest(string_split({norm}, ' ')) AS w
          FROM {table}{cond}) d
    JOIN __wtok USING (w)
    WHERE length(w) > 0
    GROUP BY doc
    ORDER BY doc
    """

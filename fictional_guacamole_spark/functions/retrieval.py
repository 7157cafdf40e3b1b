"""Lexical retrieval: inverted-index construction and BM25 ranking.

The embedding side of search lives in functions/similarity.py (cosine /
LSH / IVF / PQ) and plans/extensions.py::pipeline_rag_retrieval; this
module supplies the LEXICAL half a real corpus platform pairs with it —
the build of a term → postings inverted index, and BM25-scored keyword
search over it. (The reference app has no search surface at all; this is
engine surface in the SURVEY §2.5 "beyond the reference" sense.)

Scale shapes:

- **Index build**: explode(words) → groupBy(doc, term) tf → groupBy(term)
  fold. Both shuffles key on (doc, term) then term — scan-shaped, no hot
  key beyond natural term skew (stopword rows are wide but bounded by
  vocabulary, and the fold is a map-side-combinable agg). The postings
  list per term is sorted and digested; at 100 TB postings would be
  bucketed by term and stored columnar rather than digested, but the
  plan shape (two keyed folds) is identical.
- **BM25 search**: the query's terms filter the tf frame FIRST (predicate
  on term — at scale this is the index lookup: partition-pruned read of
  those terms' postings), then join the KB-scale per-term df stats and a
  1-row corpus-stats broadcast. The corpus never shuffles for a query.

Determinism contract (the value-hash-judged part): every score is
computed in IEEE-double ± × ÷ over integer-valued operands with an
explicit association order, mirrored token-for-token in the DuckDB
oracle renderings — correctly-rounded arithmetic is bit-identical across
engines. ``ln`` is NOT (libm last-bit), so idf uses the RATIONAL form
``(N - df + 0.5) / (df + 0.5)`` — the argument of the log in the
classic BM25+ idf, monotone in it, so per-term orderings agree — and the
multi-term score is the FIXED-ORDER sum of per-term scores pivoted out
by conditional MAX (order-free), never a float SUM aggregation (whose
partial order Spark does not fix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions.text import words

K1 = 1.2
B = 0.75


def _tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, term) frequency plus per-doc length — the map-side
    product every index/search shape below starts from."""
    staged = df.select(F.col(id_col).alias("doc"),
                       words(F.col(text_col)).alias("w"))
    terms = (staged.select("doc", F.size("w").alias("dl"),
                           F.explode("w").alias("term"))
             .filter(F.col("term") != ""))
    return terms.groupBy("doc", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))


def inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """term → (doc_freq, total_tf, postings digest).

    The digest is md5 over the doc-ordered ``doc:tf`` postings string —
    a value-hashable stand-in for the physical postings file a real
    deployment would write per term bucket; it certifies the postings
    CONTENT (membership, order, and frequencies), not just counts.
    """
    tf = _tf(df, id_col, text_col)
    postings = F.array_sort(
        F.collect_list(F.struct(F.col("doc"), F.col("tf"))))
    return (tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("doc_freq"),
                 F.sum("tf").alias("total_tf"),
                 F.md5(F.concat_ws(",", F.transform(
                     postings,
                     lambda p: F.concat_ws(":", p["doc"].cast("string"),
                                           p["tf"].cast("string")))))
                 .alias("postings_md5"))
            .select("term", "doc_freq", "total_tf", "postings_md5"))


def sql_inverted_index(table: str, id_col: str, text_col: str) -> str:
    """DuckDB replay of :func:`inverted_index` (same normalization, same
    doc-ordered postings string, same md5)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    WITH terms AS (
      SELECT {id_col} AS doc, unnest(string_split({norm}, ' ')) AS term
      FROM {table}),
    tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM terms
      WHERE term <> '' GROUP BY doc, term)
    SELECT term, COUNT(*) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           md5(string_agg(CAST(doc AS VARCHAR) || ':' ||
                          CAST(tf AS VARCHAR), ',' ORDER BY doc))
             AS postings_md5
    FROM tf GROUP BY term
    """


def _check_terms(query_terms: list[str]) -> None:
    """Shared validation for both renderings: 1–8 DISTINCT normalized
    tokens. A duplicate term would pivot into two identical columns and
    count double; a non-``[a-z0-9]`` term can never match the normalized
    token stream and would also break the SQL string literal."""
    import re

    if not (1 <= len(query_terms) <= 8):
        raise ValueError("query_terms must have 1..8 terms")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    bad = [t for t in query_terms if not re.fullmatch(r"[a-z0-9]+", t)]
    if bad:
        raise ValueError(f"query_terms must be normalized [a-z0-9]+: {bad}")


def _bm25_term_score(tf: Column, dl: Column, doc_freq: Column,
                     n_docs: Column, avgdl: Column) -> Column:
    """One term's BM25 contribution; every operand is an integer-valued
    double except ``avgdl`` (one division), every op correctly rounded,
    association order fixed by explicit parens and mirrored in
    :func:`sql_bm25_search`."""
    idf = ((F.lit(2.0) * n_docs - F.lit(2.0) * doc_freq + F.lit(1.0))
           / (F.lit(2.0) * doc_freq + F.lit(1.0)))
    tfpart = ((tf * F.lit(K1 + 1.0))
              / (tf + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (dl / avgdl))))
    return idf * tfpart


def bm25_search(df: DataFrame, id_col: str, text_col: str,
                query_terms: list[str], k: int = 10) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (k1=1.2,
    b=0.75, rational idf — module docstring).

    Plan: tf filtered to the query's terms (the index lookup), join the
    per-term df stats (term-cardinality-bounded), broadcast the 1-row
    corpus stats, pivot per-term scores to fixed columns via conditional
    MAX, sum in written order, global top-k. Ties break on doc id.
    """
    _check_terms(query_terms)
    tf = _tf(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    stats = (df.select(F.col(id_col).alias("doc"),
                       F.size(words(F.col(text_col))).alias("dl"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("dl").alias("total_dl")))

    hits = (tf.filter(F.col("term").isin(list(query_terms)))
            .join(dfreq, "term")
            .crossJoin(F.broadcast(stats)))
    avgdl = (F.col("total_dl").cast("double")
             / F.col("n_docs").cast("double"))
    scored = hits.select(
        "doc", "term",
        _bm25_term_score(F.col("tf").cast("double"),
                         F.col("dl").cast("double"),
                         F.col("doc_freq").cast("double"),
                         F.col("n_docs").cast("double"),
                         avgdl).alias("s"))
    per_doc = scored.groupBy("doc").agg(*[
        F.coalesce(F.max(F.when(F.col("term") == t, F.col("s"))),
                   F.lit(0.0)).alias(f"s{i}")
        for i, t in enumerate(query_terms)])
    total = F.col("s0")
    for i in range(1, len(query_terms)):
        total = total + F.col(f"s{i}")  # fixed written order, no agg SUM
    ranked = (per_doc.withColumn("score", total)
              .withColumn("rank", F.row_number().over(
                  W.orderBy(F.desc("score"), F.asc("doc"))).cast("int"))
              .filter(F.col("rank") <= k))
    return ranked.select("doc", "score", "rank",
                         *[f"s{i}" for i in range(len(query_terms))])


def sql_bm25_search(table: str, id_col: str, text_col: str,
                    query_terms: list[str], k: int = 10) -> str:
    """DuckDB replay of :func:`bm25_search` — identical expression tree
    (idf and tfpart parenthesization mirrored term-for-term)."""
    _check_terms(query_terms)
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    in_list = ", ".join(f"'{t}'" for t in query_terms)
    score = """(2.0 * n_docs - 2.0 * doc_freq + 1.0)
               / (2.0 * doc_freq + 1.0)
             * ((CAST(tf AS DOUBLE) * {k1p1})
                / (CAST(tf AS DOUBLE)
                   + {k1} * ({one_b} + {b} * (CAST(dl AS DOUBLE)
                                              / avgdl))))""".format(
        k1p1=repr(K1 + 1.0), k1=repr(K1), one_b=repr(1.0 - B), b=repr(B))
    pivots = ",\n           ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN s END), 0.0) AS s{i}"
        for i, t in enumerate(query_terms))
    total = " + ".join(f"s{i}" for i in range(len(query_terms)))
    s_cols = ", ".join(f"s{i}" for i in range(len(query_terms)))
    return f"""
    WITH docs AS (
      SELECT {id_col} AS doc, string_split({norm}, ' ') AS w FROM {table}),
    terms AS (
      SELECT doc, len(w) AS dl, unnest(w) AS term FROM docs),
    tf AS (
      SELECT doc, dl, term, COUNT(*) AS tf FROM terms
      WHERE term <> '' GROUP BY doc, dl, term),
    dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len(w)) AS total_dl FROM docs),
    hits AS (
      SELECT doc, tf.term, tf, dl, doc_freq,
             CAST(n_docs AS DOUBLE) AS n_docs,
             CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
      WHERE tf.term IN ({in_list})),
    scored AS (
      SELECT doc, term, {score} AS s FROM hits),
    per_doc AS (
      SELECT doc,
           {pivots}
      FROM scored GROUP BY doc),
    ranked AS (
      SELECT doc, {total} AS score, {s_cols},
             CAST(ROW_NUMBER() OVER (ORDER BY {total} DESC, doc)
                  AS INTEGER) AS rank
      FROM per_doc)
    SELECT doc, score, rank, {s_cols} FROM ranked WHERE rank <= {k}
    """

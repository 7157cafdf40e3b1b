"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each):

- **exact**: hash-groupBy on a fingerprint — one shuffle, arbitrarily
  partitionable; the dedup you run first at 100 TB.
- **n-gram Jaccard**: exact set similarity via shingle-explode + equi-join on
  shingle. Quadratic in bucket size, so it's the *verifier*, not the
  candidate generator, at scale.
- **MinHash+LSH**: the scale path. Signatures are 32 independent min-hashes
  (one shuffle: explode shingles → groupBy doc); banding (8 bands × 4 rows)
  turns near-dup search into an equi-join on (band, band-signature) — no
  all-pairs comparison ever materializes.
- **SimHash**: bitwise fingerprint whose Hamming distance tracks cosine
  similarity of the token multiset; one explode + one groupBy.

Hashing is md5-based (not Spark's murmur3 ``hash()``) so every step is
bit-reproducible in ANSI SQL — the DuckDB oracle replays the identical
computation (see the ``*_SQL`` builders, consumed by plans/extensions.py).
Seeds for the minhash permutations are module constants; both engines use
the same arithmetic in int64 range (h < 2^32, a < 2^29 ⇒ a*h+b < 2^62).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Column, DataFrame, Observation, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions.text import normalize

# --- shared constants (must match the SQL renderings below) ---------------

MINHASH_K = 32          # signature length
LSH_BANDS = 8           # bands × rows = K
LSH_ROWS = 4
MINHASH_P = (1 << 61) - 1
SIMHASH_BITS = 32

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, 1 << 29) | 1 for _ in range(MINHASH_K)]  # odd
MINHASH_B = [_rng.randrange(0, 1 << 31) for _ in range(MINHASH_K)]


# --- hashing primitives ----------------------------------------------------

def md5_long(col: Column, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` of md5 as a non-negative int64 (portable to
    DuckDB as ``CAST('0x' || substr(md5(x),1,n) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def sql_md5_long(expr: str, hex_chars: int = 8) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, {hex_chars}) AS BIGINT)"


# --- shingling -------------------------------------------------------------

def word_shingles(words_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams from an array-of-words column (empty array if
    < n words).

    PERFORMANCE: ``words_col`` must be an already-materialized (named)
    column. When a split+regexp expression is inlined here, every
    ``element_at`` inside the transform lambda re-evaluates it per element
    — measured 20× slower. :func:`shingle_rows` does the staging.
    """
    w = words_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def words_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, __w) rows: each document's normalized, space-split word array
    — the ONE tokenize stage every text-dedup path derives from.

    The two-step projection matters: a named intermediate column is
    computed once per row, while an inline expression is re-evaluated
    inside every higher-order-function lambda invocation.

    The (id, text) projection fans out before the compute: normalize +
    split + n-gram transform + md5 downstream is the CPU-heavy part of
    every dedup path, and a single-row-group local scan would otherwise
    pin it to one core (no-op on a many-partition cluster scan).

    Round 16 (guide §2.4/§6): extracted as the shared tokenize frame so a
    pipeline that needs BOTH minhash shingles and hashed-TF tokens over
    the same documents (semantic_pairs, the dedup cascade) can cache ONE
    (doc, words) frame and derive both — the old shape re-ran
    scan → survivor-join → normalize → split once per consumer subtree.
    """
    from fictional_guacamole_spark.tables import fan_out
    return fan_out(df.select(F.col(id_col).alias("doc"),
                             F.col(text_col).alias("__t"))) \
        .select("doc", F.split(normalize(F.col("__t")), " ").alias("__w"))


def shingle_rows_from_words(words: DataFrame, n: int = 3) -> DataFrame:
    """(doc, s) exploded n-gram shingles from a (doc, __w) words frame
    (see :func:`words_frame`)."""
    return words.select("doc",
                        F.explode(word_shingles(F.col("__w"), n)).alias("s"))


def shingle_rows(df: DataFrame, id_col: str, text_col: str,
                 n: int = 3) -> DataFrame:
    """(doc, shingle) rows: words staged as a column, then n-grams
    exploded (see :func:`words_frame` for the staging discipline)."""
    return shingle_rows_from_words(words_frame(df, id_col, text_col), n)


def sql_word_shingles(expr: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles` (1-based list indexing)."""
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    w = f"string_split({norm}, ' ')"
    parts = " || ' ' || ".join(f"__w[i + {j}]" for j in range(n))
    return (f"(SELECT list_distinct(list_transform("
            f"generate_series(1, len(__w) - {n - 1}), i -> {parts})) "
            f"FROM (SELECT {w} AS __w) __s)")


# --- winnowing (rolling-hash fingerprints) ---------------------------------

WINNOW_K = 5   # char k-gram length
WINNOW_W = 4   # window of consecutive k-gram hashes; density ≈ 2/(w+1)


def winnow_rows(df: DataFrame, id_col: str, text_col: str,
                k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """(doc, fp) rows: distinct winnowing fingerprints per document
    (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003).

    Hash every char ``k``-gram, slide a window of ``w`` consecutive
    hashes, keep each window's minimum — any shared substring of length
    ≥ k+w-1 is guaranteed to share a fingerprint, while the index holds
    only ~2/(w+1) of the k-gram hashes. That density factor is the scale
    story versus shingle indexing: the fingerprint equi-join shuffles a
    fraction of the shingle join's rows for the same guarantee.

    Staging discipline: grams and hashes are materialized as named array
    columns between selects — ``slice(__h, j, w)`` inside the window
    lambda must reference a concrete column, or the whole hash pipeline
    re-evaluates per window position (the measured 20× HOF pitfall).
    Documents shorter than ``k`` chars yield no fingerprints; documents
    with fewer than ``w`` k-grams yield one (the global minimum).
    """
    from fictional_guacamole_spark.tables import fan_out
    staged = fan_out(df.select(F.col(id_col).alias("doc"),
                               F.col(text_col).alias("__raw"))) \
        .select("doc", normalize(F.col("__raw")).alias("__t"))
    # Spark's sequence(1, stop) DESCENDS when stop < 1 — gate short docs
    # to an empty gram list instead (CaseWhen branches evaluate lazily)
    gram_seq = F.transform(
        F.sequence(F.lit(1), F.length("__t") - (k - 1)),
        lambda i: F.col("__t").substr(i, F.lit(k)))
    grams = staged.select(
        "doc",
        F.when(F.length("__t") >= k, gram_seq)
         .otherwise(F.array().cast("array<string>")).alias("__g"))
    # explicit unary lambda: F.transform would otherwise bind md5_long's
    # hex_chars parameter to the element INDEX (binary-lambda dispatch)
    hashes = grams.select(
        "doc", F.transform(F.col("__g"), lambda g: md5_long(g)).alias("__h"))
    n = F.size("__h")
    windows = F.transform(
        F.sequence(F.lit(1), n - (w - 1)),
        lambda j: F.array_min(F.slice(F.col("__h"), j, w)))
    fps = (F.when(n >= w, windows)
           .when(n > 0, F.array(F.array_min(F.col("__h"))))
           .otherwise(F.array().cast("array<long>")))
    return hashes.select("doc",
                         F.explode(F.array_distinct(fps)).alias("fp"))


def sql_winnow_rows(table: str, id_col: str, text_col: str,
                    k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """DuckDB rendering of :func:`winnow_rows` (1-based, inclusive list
    slicing; identical md5-based k-gram hashes)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    gram_hash = sql_md5_long(f"substr(__t, i, {k})")
    return f"""
    SELECT doc, unnest(list_distinct(
      CASE WHEN len(__h) >= {w} THEN
        list_transform(generate_series(1, len(__h) - {w - 1}),
                       j -> list_min(__h[j:j + {w - 1}]))
      WHEN len(__h) > 0 THEN [list_min(__h)]
      ELSE [] END)) AS fp
    FROM (
      SELECT doc, list_transform(
        generate_series(1, greatest(len(__t) - {k - 1}, 0)),
        i -> {gram_hash}) AS __h
      FROM (SELECT {id_col} AS doc, {norm} AS __t FROM {table}) s1) s2
    """


def winnow_pairs(df: DataFrame, id_col: str, text_col: str,
                 k: int = WINNOW_K, w: int = WINNOW_W,
                 min_shared: int = 3) -> DataFrame:
    """Candidate near-dup pairs sharing ≥ ``min_shared`` winnowing
    fingerprints, with the fingerprint-Jaccard attached. Same equi-join
    shape as the shingle pair join but over the ~2/(w+1)-density index."""
    fp = winnow_rows(df, id_col, text_col, k, w).cache()
    sizes = fp.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("n_b"))
    sim = (F.col("shared").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("shared")))
    return (shared.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", "shared", "n_a", "n_b",
                    sim.alias("fp_jaccard")))


def sql_winnow_pairs(table: str, id_col: str, text_col: str,
                     k: int = WINNOW_K, w: int = WINNOW_W,
                     min_shared: int = 3) -> str:
    rows = sql_winnow_rows(table, id_col, text_col, k, w)
    return f"""
    WITH fp AS ({rows}),
    sizes AS (SELECT doc, COUNT(*) AS n_fp FROM fp GROUP BY doc),
    shared AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc < b.doc
      GROUP BY a.doc, b.doc
      HAVING COUNT(*) >= {min_shared})
    SELECT doc_a, doc_b, shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
           CAST(shared AS DOUBLE) / (sa.n_fp + sb.n_fp - shared) AS fp_jaccard
    FROM shared JOIN sizes sa ON doc_a = sa.doc
                JOIN sizes sb ON doc_b = sb.doc
    ORDER BY doc_a, doc_b
    """


# --- exact dedup -----------------------------------------------------------

def exact_dedup_keys(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized text: canonical (min) id + dup count.

    Pure hash-groupBy on the md5 fingerprint — the grouping key is 32 bytes
    regardless of document size, so the shuffle is tiny relative to data.
    """
    return (
        df.select(F.col(id_col), F.md5(normalize(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- n-gram Jaccard --------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard >= ``threshold``.

    explode(shingles) → equi-join on shingle → count common → join sizes.
    The only shuffles are on the shingle string and the id; no cartesian
    product. At 100 TB you run this per-LSH-bucket (see minhash_lsh_pairs)
    rather than globally.
    """
    # the shingle frame feeds three subtrees (sizes + both join sides);
    # cache so the explode/normalize pipeline runs once. merge hints on
    # the self-join: Catalyst's size estimate for an exploded frame is
    # the INPUT relation's size, so at large SF it happily broadcasts a
    # ~1 GB shingle side (observed: driver broadcast OOM at sf10 on the
    # dup-saturated replica corpus, the same failure mode as the r10
    # semantic verify); SMJ shuffles by shingle at any SF, and this
    # verifier path is not in the bench headline set.
    sh = shingle_rows(df, id_col, text_col, n).hint("merge").cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (F.col("common").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("common")))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "n_a", "n_b", "jaccard")
    )


def sql_ngram_jaccard_pairs(table: str, id_col: str, text_col: str,
                            n: int = 3, threshold: float = 0.5) -> str:
    shingles = sql_word_shingles(text_col, n)
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc, unnest({shingles}) AS s FROM {table}),
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    common AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
      GROUP BY a.doc, b.doc)
    SELECT doc_a, doc_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common JOIN sizes sa ON doc_a = sa.doc
                JOIN sizes sb ON doc_b = sb.doc
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= {threshold}
    ORDER BY doc_a, doc_b
    """


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """MinHash signature from an existing (doc, s) shingle frame — lets a
    pipeline that also needs the shingles for exact verification compute
    them ONCE (cache the shingle frame, derive both) instead of Catalyst
    re-evaluating the shingle transform in every subtree."""
    h = sh.select("doc", md5_long(F.col("s")).alias("h"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
              % F.lit(MINHASH_P)).alias(f"m{i}")
        for i in range(MINHASH_K)
    ]
    return h.groupBy("doc").agg(*aggs)


def shingle_arrays(df: DataFrame, id_col: str, text_col: str,
                   n: int = 3) -> DataFrame:
    """(doc, __s) rows: each document's DISTINCT word n-grams as one array
    column; documents with no shingle (< n words) are dropped, matching
    the explode form's doc set exactly. Same staging discipline as
    :func:`words_frame` (named intermediates, fan_out before the
    CPU-heavy transform)."""
    return (words_frame(df, id_col, text_col)
            .select("doc", word_shingles(F.col("__w"), n).alias("__s"))
            .filter(F.size("__s") >= 1))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3) -> DataFrame:
    """Per-document MinHash signature: columns m0..m{K-1}.

    One explode + one groupBy; the K min-aggregates fold map-side (partial
    aggregation), so shuffle volume is K longs per doc regardless of size.

    A zero-shuffle variant (per-doc shingle arrays + 32
    ``array_min(transform(...))`` folds) was MEASURED OUT in round 15:
    higher-order functions run interpreted, outside whole-stage codegen,
    and each transform materializes a fresh array — 10.1 s vs 0.78 s for
    this form at sf0.1 (n=3). The explode+groupBy shape keeps the md5 +
    permutation arithmetic inside codegen and the exchange it pays is
    K longs per doc, which partial aggregation already minimizes."""
    return minhash_signatures_from_shingles(
        shingle_rows(df, id_col, text_col, n))


def sql_minhash_signatures(table: str, id_col: str, text_col: str,
                           n: int = 3) -> str:
    shingles = sql_word_shingles(text_col, n)
    mins = ",\n           ".join(
        f"MIN(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_P}) AS m{i}"
        for i in range(MINHASH_K))
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc, unnest({shingles}) AS s FROM {table}),
    h AS (SELECT doc, {sql_md5_long('s')} AS h FROM sh)
    SELECT doc, {mins}
    FROM h GROUP BY doc
    """


def minhash_band_keys(sig: DataFrame) -> DataFrame:
    """Explode a signature frame into (doc, band, band_sig) rows; near-dup
    candidates are rows sharing (band, band_sig) — a plain equi-join key."""
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              F.md5(F.concat_ws("_", *cols)).alias("band_sig")))
    return (sig.select("doc", F.explode(F.array(*bands)).alias("bk"))
            .select("doc", F.col("bk.band").alias("band"),
                    F.col("bk.band_sig").alias("band_sig")))


def band_candidates(bk: DataFrame) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) from a (doc, band,
    band_sig) frame.

    Round 15 (guide §2.4): the original two-sided band self-join
    shuffled ``bk`` twice and joined; grouping each band bucket ONCE and
    expanding its doc pairs in-bucket (sorted array → upper-triangle
    transform) produces the IDENTICAL pair set — rows sharing
    (band, band_sig) — with a single exchange. Bucket co-location is
    unchanged from the self-join (a band bucket always lands in one
    task either way), so the skew posture at 100 TB is the same: bucket
    size is governed by banding selectivity, the documented knob.

    Second r15 pass: duplicate doc-SET buckets are dropped BEFORE the
    O(k²) pair expansion (``.distinct()`` on the sorted member array).
    Under weakly-selective banding the same doc set recurs across
    bands — measured on the cascade's 1-gram sem stage (sf0.1): 96
    buckets but only 12 distinct member sets, so the expansion emitted
    5.88 M pair structs to distinct down to 735 K; deduping the sets
    first emits each pair from at most a few set-variants
    (4.8 s → 1.5 s, pair set identical). The extra exchange moves one
    array row per bucket — the same bytes the expansion input already
    shuffles — and duplicate pairs from DIFFERENT member sets still
    fold in the final pair-level distinct, exactly as before.
    """
    grp = (bk.groupBy("band", "band_sig")
           .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
           .filter(F.size("ds") >= 2)
           .select("ds").distinct())
    pairs = F.flatten(F.transform(
        F.col("ds"),
        lambda a, i: F.transform(
            F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
            lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")))))
    return (grp.select(F.explode(pairs).alias("p"))
            .select("p.doc_a", "p.doc_b").distinct())


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs from LSH banding, with the estimated
    Jaccard (fraction of agreeing signature components) attached."""
    return minhash_lsh_pairs_from_words(
        words_frame(df, id_col, text_col), n)


def minhash_lsh_pairs_from_words(words: DataFrame, n: int = 3) -> DataFrame:
    """:func:`minhash_lsh_pairs` over an existing (doc, __w) words frame —
    lets a pipeline that tokenizes once (the dedup cascade's shared
    survivor token frame, r16) feed the banding without re-running
    scan → normalize → split."""
    sig = minhash_signatures_from_shingles(
        shingle_rows_from_words(words, n)).cache()
    cand = band_candidates(minhash_band_keys(sig))
    sa = sig.select(F.col("doc").alias("doc_a"),
                    *[F.col(f"m{i}").alias(f"a{i}") for i in range(MINHASH_K)])
    sb = sig.select(F.col("doc").alias("doc_b"),
                    *[F.col(f"m{i}").alias(f"b{i}") for i in range(MINHASH_K)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(MINHASH_K))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                (agree.cast("double") / MINHASH_K).alias("est_jaccard"))
    )


def sql_minhash_band_rows(sig_cte: str) -> str:
    """The one SQL rendering of :func:`minhash_band_keys` — a UNION ALL of
    per-band (doc, band, band_sig) selects over a signature CTE. Every
    oracle that bands signatures MUST compose this helper (three sites
    round 10: the LSH pair oracle, the semantic-dedup blocking CTE, the
    incremental-ingest probe) so a LSH_BANDS/LSH_ROWS/separator change
    cannot silently diverge between judged rows."""
    return "\n      UNION ALL\n      ".join(
        "SELECT doc, {b} AS band, md5({concat}) AS band_sig FROM {cte}"
        .format(
            b=b,
            concat=" || '_' || ".join(
                f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS)),
            cte=sig_cte,
        )
        for b in range(LSH_BANDS))


def sql_minhash_lsh_pairs(table: str, id_col: str, text_col: str,
                          n: int = 3) -> str:
    sig_sql = sql_minhash_signatures(table, id_col, text_col, n)
    band_rows = sql_minhash_band_rows("sig")
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_K))
    return f"""
    WITH sig AS MATERIALIZED ({sig_sql}),
    bands AS MATERIALIZED (
      {band_rows}),
    cand AS MATERIALIZED (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc < y.doc)
    SELECT doc_a, doc_b,
           CAST(({agree}) AS DOUBLE) / {MINHASH_K} AS est_jaccard
    FROM cand JOIN sig sa ON cand.doc_a = sa.doc
              JOIN sig sb ON cand.doc_b = sb.doc
    ORDER BY doc_a, doc_b
    """


def lsh_verified_pairs(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, threshold: float = 0.5) -> DataFrame:
    """The production near-dup pipeline: LSH banding generates candidates,
    exact n-gram Jaccard verifies them — no all-pairs stage anywhere.

    At 100 TB this is the only shape that works: candidate generation is
    an equi-join on (band, band_sig); the exact verifier joins each
    candidate pair's two shingle ARRAYS (one row per pair, set
    intersection in the JVM), so verification cost is proportional to
    candidate volume, not corpus².

    Round 15 (guide §2.3/§2.4): one cached (doc, shingle-array) frame
    feeds the map-side signatures AND the verify join. The old shape
    exploded shingles to rows, re-grouped them for signatures and sizes,
    and verified via a pair×shingle equi-join + count — ~10 exchanges;
    this shape has the band-bucket groupBy, the candidate distinct, and
    two per-doc array joins — and ``size(array_intersect(...))`` over
    distinct arrays equals the exploded equality-join count exactly, so
    the judged jaccard values are bit-identical.
    """
    sharr = shingle_arrays(df, id_col, text_col, n).cache()
    # signatures still come from the codegen'd explode+groupBy form (the
    # HOF fold was measured 13× slower — see minhash_signatures); the
    # explode here reads the CACHED arrays, so shingling runs once
    sig = minhash_signatures_from_shingles(
        sharr.select("doc", F.explode("__s").alias("s")))
    cand = band_candidates(minhash_band_keys(sig))
    a = sharr.select(F.col("doc").alias("doc_a"), F.col("__s").alias("s_a"))
    b = sharr.select(F.col("doc").alias("doc_b"), F.col("__s").alias("s_b"))
    common = F.size(F.array_intersect("s_a", "s_b"))
    jac = (common.cast("double")
           / (F.size("s_a") + F.size("s_b") - common))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def sql_lsh_verified_pairs(table: str, id_col: str, text_col: str,
                           n: int = 3, threshold: float = 0.5) -> str:
    lsh = sql_minhash_lsh_pairs(table, id_col, text_col, n)
    shingles = sql_word_shingles(text_col, n)
    return f"""
    WITH lsh_pairs AS ({lsh}),
    cand AS (SELECT doc_a, doc_b FROM lsh_pairs),
    vsh AS MATERIALIZED (
      -- named vsh, NOT sh: the signatures CTE nested inside lsh_pairs
      -- also defines `sh`, and DuckDB 1.x hits an internal error
      -- ("Recursive CTE scan found without recursive CTE node") when a
      -- MATERIALIZED outer CTE shadows a nested CTE's name
      SELECT {id_col} AS doc, unnest({shingles}) AS s FROM {table}),
    sizes AS MATERIALIZED (
      SELECT doc, COUNT(*) AS n_sh FROM vsh GROUP BY doc),
    common AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS common
      FROM cand c JOIN vsh a ON a.doc = c.doc_a
                  JOIN vsh b ON b.doc = c.doc_b AND a.s = b.s
      GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b,
           CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common JOIN sizes sa ON doc_a = sa.doc
                JOIN sizes sb ON doc_b = sb.doc
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= {threshold}
    ORDER BY doc_a, doc_b
    """


def dedup_components(pairs: DataFrame, ids: DataFrame,
                     max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc, canonical_id).

    The last step of a dedup pipeline: pair evidence (from LSH/Jaccard)
    becomes duplicate *groups*, each keeping its minimum id as canonical.
    Label propagation: every node repeatedly adopts the minimum label in
    its neighborhood until fixpoint — each iteration is one distributed
    join+groupBy (Pregel-lite); iteration count is bounded by the graph
    diameter, which for near-dup clusters is tiny. The driver only
    coordinates the loop and checks convergence (an O(1) count per
    round), never touches row data.

    ``pairs``: (doc_a, doc_b) edges. ``ids``: one-column frame of all doc
    ids (isolated docs become their own canonical).

    Round-15 acceleration (measured on the dedup cascade's sem stage:
    9 propagation rounds — a long label chain — at ~0.4 s of fixed
    per-round cost on a 1 701-node graph, with the expensive ``pairs``
    plan re-executed for BOTH edge-direction union branches when the
    cache filled). Three changes, all result-identical:

    - ``pairs`` is localCheckpointed once, so the edge build costs one
      execution of the (often expensive) pair plan, not two;
    - each round's neighborhood ALSO includes the label edge
      ``node → label(node)``, which folds the classic pointer-jumping
      shortcut (``label ← min(label, label(label))``) into the same
      join — convergence needs ~O(log diameter) rounds instead of
      O(diameter), at zero extra joins per round;
    - two propagation steps run per checkpoint + convergence probe (the
      fixed cost), and the probe rides the checkpoint itself: an
      ``observe`` metric (sum of change flags) is collected by the SAME
      job that materializes the eager localCheckpoint, so a cycle costs
      ONE Spark job instead of two (checkpoint + a separate count scan).

    Every step is monotone decreasing toward the same unique fixpoint
    (labels are always component-member ids; at a fixpoint labels are
    constant per component and self-labeled, hence the component
    minimum), so the result equals the plain label-propagation answer
    bit-for-bit — the judged rows' hashes pin this.
    """
    id_col = ids.columns[0]
    labels = ids.select(F.col(id_col).alias("node"),
                        F.col(id_col).alias("label"))
    p = pairs.localCheckpoint(eager=True)
    edges = (p.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .union(p.select(F.col("doc_b"), F.col("doc_a")))
             .distinct().cache())

    def step(lbl: DataFrame) -> DataFrame:
        # label edges make the pointer-jump ride the one neighborhood
        # join; each node's own label travels as a tagged self-message so
        # the new label AND the change flag fall out of one groupBy — a
        # step is one join + one aggregation, no re-join of old labels
        aug = edges.union(lbl.select(F.col("node").alias("u"),
                                     F.col("label").alias("v")))
        relayed = (aug.join(lbl.select(F.col("node").alias("n2"),
                                       F.col("label").alias("l2")),
                            F.col("v") == F.col("n2"))
                   .select("u", "l2", F.lit(False).alias("self")))
        msgs = relayed.union(
            lbl.select(F.col("node").alias("u"),
                       F.col("label").alias("l2"),
                       F.lit(True).alias("self")))
        return (msgs.groupBy("u")
                .agg(F.min("l2").alias("label"),
                     F.min(F.when(F.col("self"), F.col("l2"))).alias("old"))
                .select(F.col("u").alias("node"), "label",
                        (F.col("label") < F.col("old")).alias("chg")))

    for _ in range(max_iters):
        once = step(labels)
        # the probe reads only the SECOND step's flag: if step 2 changed
        # nothing, step 1's output was already the fixpoint, so the loop
        # may exit regardless of what step 1 did
        new_labels = step(once.select("node", "label"))
        # convergence probe fused into the checkpoint (r15): the observe
        # metric is collected by the eager checkpoint's own
        # materialization job, so no separate count() job runs per cycle
        obs = Observation()
        new_labels = new_labels.observe(
            obs, F.sum(F.col("chg").cast("long")).alias("changed"))
        # localCheckpoint truncates lineage — without it each round's plan
        # embeds every previous round and analysis cost compounds
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = obs.get["changed"] or 0  # None on an empty frame
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc"),
                         F.col("label").alias("canonical_id"))


def sql_dedup_components(pairs_sql: str, table: str, id_col: str) -> str:
    """DuckDB oracle: min-label connected components via recursive CTE
    (UNION semantics dedupe visited (node,label) states; the final
    aggregate keeps each node's minimum reachable label)."""
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    walk(node, label) AS (
      SELECT {id_col}, {id_col} FROM {table}
      UNION
      SELECT e.u, w.label
      FROM walk w JOIN edges e ON e.v = w.node
      WHERE w.label < e.u)
    SELECT node AS doc, MIN(label) AS canonical_id
    FROM walk GROUP BY node
    """


def sql_components_ctes(prefix: str, pairs_cte: str, nodes_cte: str,
                        node_col: str) -> str:
    """CTE-list fragment rendering of :func:`dedup_components` —
    ``{prefix}_edges`` / ``{prefix}_walk`` / ``{prefix}_comp(doc,
    canonical_id)`` over an ALREADY-DEFINED pairs CTE and node CTE.
    Unlike :func:`sql_dedup_components` (a complete standalone query),
    this composes MULTIPLE walks inside one outer ``WITH RECURSIVE``
    clause — the dedup-cascade oracle runs two (minhash components over
    exact-dedup survivors, then semantic components over near-dup
    survivors). Same walk semantics: UNION dedupes visited
    (node, label) states; the final aggregate keeps each node's minimum
    reachable label."""
    return f"""
    {prefix}_edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM {pairs_cte}
      UNION
      SELECT doc_b, doc_a FROM {pairs_cte}),
    {prefix}_walk(node, label) AS (
      SELECT {node_col}, {node_col} FROM {nodes_cte}
      UNION
      SELECT e.u, w.label
      FROM {prefix}_walk w JOIN {prefix}_edges e ON e.v = w.node
      WHERE w.label < e.u),
    {prefix}_comp AS (
      SELECT node AS doc, MIN(label) AS canonical_id
      FROM {prefix}_walk GROUP BY node)"""


# --- SimHash ---------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over distinct word tokens (md5-hashed): one row per
    doc with the packed fingerprint. explode + groupBy; partial aggregation
    keeps the shuffle at one long per (doc, bit-plane fold)."""
    w = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(normalize(F.col(text_col)), " ")))
         .alias("t"))
    h = w.select("doc", md5_long(F.col("t")).alias("h"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = h.groupBy("doc").agg(*bit_sums)
    packed = sum(
        F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(SIMHASH_BITS)
    )
    return sums.select("doc", packed.alias("simhash"))


def sql_simhash(table: str, id_col: str, text_col: str) -> str:
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS))
    packed = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS))
    return f"""
    WITH w AS (
      SELECT {id_col} AS doc,
             unnest(list_distinct(string_split({norm}, ' '))) AS t
      FROM {table}),
    h AS (SELECT doc, {sql_md5_long('t')} AS h FROM w),
    sums AS (SELECT doc, {bit_sums} FROM h GROUP BY doc)
    SELECT doc, {packed} AS simhash FROM sums
    """


# --- benchmark decontamination (cross-corpus n-gram semi-join) -------------

def decontaminate(train: DataFrame, probes: DataFrame, id_col: str,
                  text_col: str, n: int = 4) -> DataFrame:
    """Flag training documents that share ANY word n-gram with a probe
    (benchmark) corpus — the contamination check every serious training
    pipeline runs before a model sees the data (the eval suite must not
    leak into the corpus).

    Scale shape: the probe side is benchmark suites — megabytes against a
    100 TB corpus — so its distinct shingles BROADCAST and the check runs
    as a map-side semi-join at scan speed; the corpus never shuffles. The
    n-gram length trades precision for recall exactly like dedup
    shingling (real pipelines use 8–13-gram windows; the synthetic
    fixture's tiny vocabulary makes 4 the informative scale in tests).
    """
    t = shingle_rows(train, id_col, text_col, n)
    p_shingles = (shingle_rows(probes, id_col, text_col, n)
                  .select("s").distinct())
    hits = (t.join(F.broadcast(p_shingles), "s")
            .select("doc").distinct()
            .withColumn("contaminated", F.lit(True)))
    return (train.select(F.col(id_col).alias("doc"))
            .join(hits, "doc", "left")
            .select("doc",
                    F.coalesce(F.col("contaminated"), F.lit(False))
                    .alias("contaminated")))


def sql_decontaminate(train_sql: str, probes_sql: str, id_col: str,
                      text_col: str, n: int = 4) -> str:
    """DuckDB replay of :func:`decontaminate` (same shingle rendering)."""
    grams = sql_word_shingles(text_col, n)
    return f"""
    WITH train AS ({train_sql}), probes AS ({probes_sql}),
    t_sh AS (SELECT {id_col} AS doc, unnest({grams}) AS s FROM train),
    p_sh AS (SELECT DISTINCT unnest({grams}) AS s FROM probes),
    hits AS (SELECT DISTINCT doc FROM t_sh JOIN p_sh USING (s))
    SELECT train.{id_col} AS doc,
           (hits.doc IS NOT NULL) AS contaminated
    FROM train LEFT JOIN hits ON train.{id_col} = hits.doc
    """


# --- Bloom-filter decontamination (memory-bounded membership) --------------

BLOOM_BITS_PER_KEY = 12   # m/n = 12 bits/key → FP ≈ 0.3% with k = 6 probes
BLOOM_NUM_HASHES = 6      # ≈ (m/n)·ln 2, the FP-minimizing probe count


def _bloom_positions(h, m_bits, i):
    """Double-hashing probe i for uint64 hash array `h` (Kirsch–Mitzenmacher:
    g_i = h1 + i·h2 gives k independent-enough probes from one 64-bit hash).
    """
    import numpy as np

    m = np.uint64(m_bits)
    h1 = h % m
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)  # odd stride
    return (h1 + np.uint64(i) * h2) % m


def bloom_build(hashes: list[int], m_bits: int) -> bytes:
    """Pack a Bloom filter over int64 key hashes into a little bit array."""
    import numpy as np

    arr = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    for i in range(BLOOM_NUM_HASHES):
        pos = _bloom_positions(h, m_bits, i)
        np.bitwise_or.at(
            arr, (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
    return arr.tobytes()


def bloom_might_contain(filter_bytes: bytes, m_bits: int, hashes) -> "object":
    """Vectorized membership test; never false-negative by construction."""
    import numpy as np

    arr = np.frombuffer(filter_bytes, dtype=np.uint8)
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    ok = np.ones(len(h), dtype=bool)
    for i in range(BLOOM_NUM_HASHES):
        pos = _bloom_positions(h, m_bits, i)
        bit = (arr[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        ok &= bit.astype(bool)
    return ok


def decontaminate_bloom(train: DataFrame, probes: DataFrame, id_col: str,
                        text_col: str, n: int = 4) -> DataFrame:
    """Benchmark decontamination with a Bloom-filter pre-filter: result is
    bit-identical to :func:`decontaminate` (shares its oracle), but the
    broadcast payload is a bit array instead of the probe shingle SET.

    Why it matters at 100 TB: broadcasting distinct probe shingles costs
    their full string bytes (~50+ B/shingle); the Bloom filter costs
    BLOOM_BITS_PER_KEY bits per shingle (~30× smaller), so the probe side
    can grow to hundreds of millions of shingles — a full eval-suite
    union — while the contamination check stays a map-side scan-speed
    filter with no corpus shuffle. Bloom false positives (~0.3 %) are
    repaired by an exact broadcast semi-join over ONLY the surviving
    (doc, shingle) rows, so correctness never depends on the filter.

    The probe-hash ``collect()`` is bounded by the same contract as the
    broadcast in :func:`decontaminate`: probes are benchmark suites,
    megabytes by design, never the corpus.
    """
    spark = train.sparkSession
    t = shingle_rows(train, id_col, text_col, n)
    p_shingles = (shingle_rows(probes, id_col, text_col, n)
                  .select("s").distinct())
    keys = [r[0] for r in
            p_shingles.select(F.xxhash64("s").alias("h")).collect()]
    m_bits = max(64, len(keys) * BLOOM_BITS_PER_KEY)
    bc = spark.sparkContext.broadcast(bloom_build(keys, m_bits))

    @F.pandas_udf("boolean")
    def _might_contain(h: pd.Series) -> pd.Series:
        return pd.Series(
            bloom_might_contain(bc.value, m_bits, h.to_numpy(dtype="int64")))

    survivors = (t.withColumn("h", F.xxhash64("s"))
                 .filter(_might_contain("h")))
    hits = (survivors.join(F.broadcast(p_shingles), "s")  # exact FP repair
            .select("doc").distinct()
            .withColumn("contaminated", F.lit(True)))
    return (train.select(F.col(id_col).alias("doc"))
            .join(hits, "doc", "left")
            .select("doc",
                    F.coalesce(F.col("contaminated"), F.lit(False))
                    .alias("contaminated")))


# --- C4-style line-level global dedup --------------------------------------

LINE_DEDUP_MIN_WORDS = 5  # units shorter than this never participate


def line_dedup_summary(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """C4-style line-level global deduplication (Raffel et al. 2020 dedup
    three-sentence spans across the whole corpus; the fixture text is
    newline-free, so the unit here is the sentence — normalized text split
    on '. ').

    A unit with ≥ LINE_DEDUP_MIN_WORDS words is "dedupable"; its canonical
    owner is the minimum doc id containing it, and every other document
    drops its copy. Output is the per-document summary (unit counts +
    drops) — the scalar-typed judged projection of the survivor layout.

    Scale shape: explode to (doc, unit) → distinct → global groupBy on the
    unit string for owners → equi-join back. Both shuffles key on the unit
    hash, so frequency skew concentrates only identical strings (bounded
    by corpus duplication itself); at 100 TB the unit key would be
    md5(unit) to keep shuffle rows narrow — semantics unchanged.
    """
    from fictional_guacamole_spark.functions.text import normalize

    doc = F.col(id_col)
    # strip the trailing period after the split: the document-final
    # sentence otherwise keeps its '.' and can never match a mid-document
    # copy of the same sentence
    units = (df.select(doc.alias("doc"),
                       F.explode(F.split(normalize(F.col(text_col)), r"\. "))
                       .alias("u"))
             .select("doc",
                     F.regexp_replace(F.col("u"), r"\.$", "").alias("unit"))
             .filter(F.col("unit") != ""))
    per_doc = units.groupBy("doc").agg(F.count(F.lit(1)).alias("n_units"))
    cand = (units
            .filter(F.size(F.split(F.col("unit"), " "))
                    >= LINE_DEDUP_MIN_WORDS)
            .select("doc", "unit").distinct())
    owners = cand.groupBy("unit").agg(F.min("doc").alias("owner"))
    dropped = (cand.join(owners, "unit")
               .groupBy("doc")
               .agg(F.count(F.lit(1)).alias("n_candidates"),
                    F.sum(F.when(F.col("owner") < F.col("doc"), 1)
                          .otherwise(0)).alias("n_dropped")))
    return (per_doc.join(dropped, "doc", "left")
            .select("doc", "n_units",
                    F.coalesce(F.col("n_candidates"), F.lit(0))
                    .alias("n_candidates"),
                    F.coalesce(F.col("n_dropped"), F.lit(0))
                    .alias("n_dropped")))


def sql_line_dedup_summary(table: str, id_col: str, text_col: str) -> str:
    """DuckDB replay of :func:`line_dedup_summary` (same normalization,
    same '. ' split, same ownership rule)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    WITH raw_units AS (
      SELECT {id_col} AS doc,
             unnest(string_split_regex({norm}, '\\. ')) AS u
      FROM {table}),
    units AS (SELECT doc, regexp_replace(u, '\\.$', '') AS unit
              FROM raw_units),
    nonempty AS (SELECT doc, unit FROM units WHERE unit <> ''),
    per_doc AS (SELECT doc, COUNT(*) AS n_units FROM nonempty GROUP BY doc),
    cand AS (
      SELECT DISTINCT doc, unit FROM nonempty
      WHERE len(string_split(unit, ' ')) >= {LINE_DEDUP_MIN_WORDS}),
    owners AS (SELECT unit, MIN(doc) AS owner FROM cand GROUP BY unit),
    dropped AS (
      SELECT doc, COUNT(*) AS n_candidates,
             SUM(CASE WHEN owner < doc THEN 1 ELSE 0 END) AS n_dropped
      FROM cand JOIN owners USING (unit) GROUP BY doc)
    SELECT per_doc.doc AS doc, CAST(n_units AS BIGINT) AS n_units,
           CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(n_dropped, 0) AS BIGINT) AS n_dropped
    FROM per_doc LEFT JOIN dropped ON per_doc.doc = dropped.doc
    """


# --- exact-substring dedup (cross-doc repeated spans) -----------------------
#
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better" (ExactSubstr): remove every text span that occurs verbatim in
# more than one training document. Their single-node tool builds a suffix
# array over the whole corpus; the Spark-first equivalent is fingerprint
# grouping — hash every word k-gram WITH its position, group by the hash to
# find grams seen in ≥ 2 distinct documents, then merge each document's
# matched positions into maximal spans (gaps-and-islands). Any duplicated
# span of ≥ k words is covered by at least one shared k-gram at every
# offset inside it, so the merged islands reconstruct the full span extent
# exactly — no suffix array needed, and every stage is a shuffle-friendly
# groupBy/equi-join instead of a global sort.

SUBSTR_K = 6  # minimum duplicated-span length, in words


def gram_position_rows(df: DataFrame, id_col: str, text_col: str,
                       k: int = SUBSTR_K) -> DataFrame:
    """(doc, pos, gh, n_words) rows: every word ``k``-gram of the
    normalized text as (1-based start position, 60-bit md5 hash).

    The gram string itself never leaves the map stage — only the 8-byte
    hash shuffles, so the grouping stage moves ~n_tokens × 16 bytes
    regardless of gram width. 60 bits keeps chance collisions negligible
    to ~10^8 grams; a 100 TB run would key on the full 128-bit digest as
    two longs (same plan shape, double the key width).
    """
    from fictional_guacamole_spark.tables import fan_out
    staged = fan_out(df.select(F.col(id_col).alias("doc"),
                               F.col(text_col).alias("__raw"))) \
        .select("doc", F.split(normalize(F.col("__raw")), " ").alias("__w"))
    staged = staged.select("doc", "__w", F.size("__w").alias("n_words"))
    # stage the gram structs as a named column (the measured 20x HOF
    # pitfall); sequence(1, stop) descends when stop < 1, so gate short docs
    grams = F.transform(
        F.sequence(F.lit(1), F.col("n_words") - (k - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            md5_long(F.concat_ws(" ", F.slice("__w", i, k)), 15).alias("gh")))
    exploded = staged.select(
        "doc", "n_words",
        F.explode(F.when(F.col("n_words") >= k, grams)
                  .otherwise(F.array().cast(
                      "array<struct<pos:int,gh:long>>"))).alias("g"))
    return exploded.select("doc", "n_words",
                           F.col("g.pos").alias("pos"),
                           F.col("g.gh").alias("gh"))


def sql_gram_position_rows(table: str, id_col: str, text_col: str,
                           k: int = SUBSTR_K) -> str:
    """DuckDB replay of :func:`gram_position_rows` (1-based inclusive
    list slicing; identical 15-hex-char md5 hash)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    gh = sql_md5_long(f"array_to_string(__w[i:i + {k - 1}], ' ')", 15)
    return f"""
    SELECT doc, n_words, i AS pos, {gh} AS gh
    FROM (
      SELECT doc, __w, len(__w) AS n_words,
             unnest(generate_series(1, greatest(len(__w) - {k - 1}, 0))) AS i
      FROM (SELECT {id_col} AS doc, string_split({norm}, ' ') AS __w
            FROM {table}) s1) s2
    """


def exact_substring_spans(df: DataFrame, id_col: str, text_col: str,
                          k: int = SUBSTR_K) -> DataFrame:
    """(doc, s, e) maximal cross-document duplicated spans (1-based word
    positions, inclusive): gaps-and-islands merge of every position whose
    ``k``-gram also occurs in another document. The shared stage of the
    summary (audit) and apply (removal) forms — one implementation, so
    the two judged rows cannot drift."""
    grams = gram_position_rows(df, id_col, text_col, k)
    shared = (grams.groupBy("gh")
              .agg(F.min("doc").alias("d_min"), F.max("doc").alias("d_max"))
              .filter(F.col("d_min") != F.col("d_max"))
              .select("gh"))
    matched = grams.join(shared, "gh").select("doc", "pos")
    w_prev = (W.partitionBy("doc").orderBy("pos")
              .rowsBetween(W.unboundedPreceding, -1))
    w_run = (W.partitionBy("doc").orderBy("pos")
             .rowsBetween(W.unboundedPreceding, 0))
    flagged = matched.select(
        "doc", "pos",
        F.max(F.col("pos") + (k - 1)).over(w_prev).alias("prev_end"))
    flagged = flagged.select(
        "doc", "pos",
        F.when(F.col("prev_end").isNull()
               | (F.col("pos") > F.col("prev_end") + 1), 1)
         .otherwise(0).alias("is_new"))
    islands = flagged.select(
        "doc", "pos", F.sum("is_new").over(w_run).alias("island"))
    return (islands.groupBy("doc", "island")
            .agg(F.min("pos").alias("s"),
                 (F.max("pos") + (k - 1)).alias("e"))
            .select("doc", "s", "e"))


def sql_exact_substring_spans(table: str, id_col: str, text_col: str,
                              k: int = SUBSTR_K) -> str:
    """DuckDB rendering of :func:`exact_substring_spans` as a CTE chain
    (grams → shared → matched → flagged → islands → spans); embed after
    ``WITH`` and consume the terminal ``spans`` CTE with (doc, s, e)."""
    grams = sql_gram_position_rows(table, id_col, text_col, k)
    return f"""
    grams AS ({grams}),
    shared AS (
      SELECT gh FROM grams GROUP BY gh HAVING MIN(doc) <> MAX(doc)),
    matched AS (
      SELECT doc, pos FROM grams JOIN shared USING (gh)),
    flagged AS (
      SELECT doc, pos,
             CASE WHEN MAX(pos + {k - 1}) OVER (
                    PARTITION BY doc ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
               OR pos > MAX(pos + {k - 1}) OVER (
                    PARTITION BY doc ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS is_new
      FROM matched),
    islands AS (
      SELECT doc, pos, SUM(is_new) OVER (
               PARTITION BY doc ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged),
    spans AS (
      SELECT doc, MIN(pos) AS s, MAX(pos) + {k - 1} AS e
      FROM islands GROUP BY doc, island)"""


def exact_substring_summary(df: DataFrame, id_col: str, text_col: str,
                            k: int = SUBSTR_K) -> DataFrame:
    """Per-document summary of cross-document duplicated spans: every
    maximal run of words covered by word ``k``-grams that also occur in
    at least one OTHER document.

    Columns: ``doc, n_words, n_dup_spans, dup_words, max_span`` —
    ``dup_words`` is exactly the number of words ExactSubstr removal
    would cut from the document (adjacent/overlapping matched grams
    coalesce into one span). Documents with no duplicated span report
    zeros, so the output is a total function of the corpus.

    Plan shape (scale story): one groupBy on the 60-bit gram hash finds
    shared grams with map-side partial aggregation (no distinct-doc set
    materializes — ``min(doc) <> max(doc)`` decides "≥ 2 distinct docs"
    in constant state); one equi-join brings the shared flag back to the
    matched positions; one per-doc window merges islands. Never all-pairs,
    never a global sort over the corpus — the suffix array's job is done
    by hash grouping.
    """
    spans = exact_substring_spans(df, id_col, text_col, k)
    per_doc = (spans.groupBy("doc")
               .agg(F.count(F.lit(1)).alias("n_dup_spans"),
                    F.sum(F.col("e") - F.col("s") + 1).cast("long")
                     .alias("dup_words"),
                    F.max(F.col("e") - F.col("s") + 1).cast("long")
                     .alias("max_span")))
    base = df.select(F.col(id_col).alias("doc"),
                     F.size(F.split(normalize(F.col(text_col)), " "))
                      .cast("long").alias("n_words"))
    return (base.join(per_doc, "doc", "left")
            .select("doc", "n_words",
                    F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long")
                     .alias("n_dup_spans"),
                    F.coalesce(F.col("dup_words"), F.lit(0)).cast("long")
                     .alias("dup_words"),
                    F.coalesce(F.col("max_span"), F.lit(0)).cast("long")
                     .alias("max_span")))


def sql_exact_substring_summary(table: str, id_col: str, text_col: str,
                                k: int = SUBSTR_K) -> str:
    """DuckDB replay of :func:`exact_substring_summary` (same hash, same
    min<>max shared test, same gaps-and-islands merge)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    WITH {sql_exact_substring_spans(table, id_col, text_col, k)},
    per_doc AS (
      SELECT doc, COUNT(*) AS n_dup_spans, SUM(e - s + 1) AS dup_words,
             MAX(e - s + 1) AS max_span
      FROM spans GROUP BY doc)
    SELECT b.doc, b.n_words,
           CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(dup_words, 0) AS BIGINT) AS dup_words,
           CAST(COALESCE(max_span, 0) AS BIGINT) AS max_span
    FROM (SELECT {id_col} AS doc,
                 CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_words
          FROM {table}) b
    LEFT JOIN per_doc ON b.doc = per_doc.doc
    ORDER BY b.doc
    """


def exact_substring_apply(df: DataFrame, id_col: str, text_col: str,
                          k: int = SUBSTR_K) -> DataFrame:
    """The removal TRANSFORM: each document with its cross-document
    duplicated spans cut out. Columns: ``doc, n_words, kept_words,
    clean_fp`` — ``clean_fp`` is the md5 of the words that survive,
    re-joined by single spaces in position order, so the judged hash pins
    the exact cleaned text of every document (a fully-duplicated doc
    keeps md5('') — the empty document, which a downstream length filter
    drops).

    Plan shape: the span stage is :func:`exact_substring_spans` verbatim;
    removal is one explode of span ranges (output ∝ duplicated words, not
    corpus size), one LEFT equi-join on (doc, pos) marking duplicated
    positions, and ONE per-doc aggregation computing n_words (every
    position), kept_words (unmarked positions) and the rebuilt-text md5
    (collect_list skips the nulls the mark turns duplicated words into)
    with an in-group sort — all hash-partitioned by doc. Round 15
    (guide §2.4): folding the separate n_words frame into this
    aggregation removed a third corpus scan + its re-join (anti→left
    mark; measured −20 % at sf0.1, output bit-equal; a fully-duplicated
    doc still reports md5('') because the empty collect_list renders
    '')."""
    spans = exact_substring_spans(df, id_col, text_col, k)
    staged = df.select(F.col(id_col).alias("doc"),
                       F.split(normalize(F.col(text_col)), " ").alias("__w"))
    words = staged.select(
        "doc", F.posexplode("__w").alias("pos0", "w")
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "w")
    dup_pos = spans.select(
        "doc", F.explode(F.sequence(F.col("s"), F.col("e"))).alias("pos"),
        F.lit(1).alias("__dup"))
    marked = words.join(dup_pos, ["doc", "pos"], "left")
    keep = F.col("__dup").isNull()
    return (marked.groupBy("doc")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.count(F.when(keep, 1)).cast("long").alias("kept_words"),
                 F.md5(F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(
                         F.when(keep, F.struct("pos", "w")))),
                     lambda x: x["w"]))).alias("clean_fp")))


def sql_exact_substring_apply(table: str, id_col: str, text_col: str,
                              k: int = SUBSTR_K) -> str:
    """DuckDB replay of :func:`exact_substring_apply` (same spans, same
    position anti-join, same space-rejoined md5)."""
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
    WITH {sql_exact_substring_spans(table, id_col, text_col, k)},
    words AS (
      SELECT doc, i AS pos, __w[i] AS w
      FROM (SELECT {id_col} AS doc, string_split({norm}, ' ') AS __w
            FROM {table}) s1,
           UNNEST(generate_series(1, len(__w))) AS _u(i)),
    dup_pos AS (
      SELECT doc, unnest(generate_series(s, e)) AS pos FROM spans),
    kept AS (
      SELECT w.doc, w.pos, w.w
      FROM words w LEFT JOIN dup_pos d
        ON w.doc = d.doc AND w.pos = d.pos
      WHERE d.doc IS NULL),
    rebuilt AS (
      SELECT doc, COUNT(*) AS kept_words,
             md5(string_agg(w, ' ' ORDER BY pos)) AS clean_fp
      FROM kept GROUP BY doc)
    SELECT b.doc, b.n_words,
           CAST(COALESCE(kept_words, 0) AS BIGINT) AS kept_words,
           COALESCE(clean_fp, md5('')) AS clean_fp
    FROM (SELECT {id_col} AS doc,
                 CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_words
          FROM {table}) b
    LEFT JOIN rebuilt ON b.doc = rebuilt.doc
    ORDER BY b.doc
    """

"""Corpus-curation operators (round 10): weighted sampling, temperature
mixing, and embedding-space (semantic) dedup — the selection/mixing layer a
100 TB training-data pipeline runs AFTER near-dup removal and quality
scoring.

Every operator here is engineered for bit-exact cross-engine replay: all
randomness derives from md5 (never engine-private hash functions), all
comparisons are integer or exactly-representable (cosine thresholds are
checked by cross-multiplied squares, never by dividing doubles; the only
floating-point op anywhere is ``sqrt``, which IEEE 754 requires to be
correctly rounded on both engines, taken under ``FLOOR`` into integers).

Reference scope note: the reference app (real_guac.py, polo_ws.py)
has no corpus layer — these extend SURVEY.md §2.5 ("operators the reference
does NOT have") for the LLM-data-pipeline mandate.

Algorithms (public literature):

- **Weighted bottom-k sampling**: Efraimidis & Spirakis 2006 rank docs by
  ``u^(1/w)``; equivalently (monotone transform) by ``min`` of ``w`` iid
  uniforms, since the minimum of ``w`` Exp(1) draws is Exp(w) — exactly the
  E-S key distribution. We realize the uniforms as integer md5 draws
  ``md5(doc:i)`` for ``i < w``, so the whole scheme is INTEGER-exact: no
  pow, no log, no float compare. Cost: ≤ ``w_cap`` md5s per doc, map-side;
  the global top-k is one TakeOrdered (no shuffle of the corpus).
- **Temperature (α=0.5) domain mixing**: multinomial domain sampling with
  ``p_d ∝ n_d^α`` (Conneau & Lample 2019, XLM; mT5). α=0.5 makes the weight
  an integer square root, the per-domain quota an exact largest-remainder
  apportionment (Hamilton's method), and the within-domain pick an md5
  ranking — bit-reproducible end to end.
- **Semantic dedup**: SemDeDup-shaped (Abbas et al. 2023) — embed, block,
  verify cosine, cluster, keep one representative. The embedding is a
  256-dim feature-hashed token-count vector (integer); candidate blocking
  is the proven MinHash band store (equi-joins, sf10-verified in
  functions/dedup.py); the cosine-threshold verify is exact integer
  arithmetic: ``cos(a,b) ≥ τ = p/q  ⟺  q²·dot² ≥ p²·|a|²·|b|²`` for
  non-negative count vectors.

  Candidate-generation note (measured, round 10): the first cut used
  random-hyperplane sign-LSH over the raw TF vectors (48-bit signature,
  6×8 bands, md5-parity ±1 planes). On this corpus it is scale-broken:
  hashed-TF vectors of a small shared vocabulary all point near the
  common-word direction, so sign tests are highly correlated across
  random pairs — measured 40 % of ALL pairs surfacing as candidates at
  both sf0.01 (49 297/124 750) and sf0.1 (5.03 M/12.5 M), i.e. a
  quadratic candidate set. Mean-centering the vectors (integer-exact as
  ``N·c − S``) cut it to ~7 %, still quadratic; integer-quantized tf-idf
  weighting collapsed 95 % of docs to zero vectors at sf0.01 (every
  word is common at small N) and stayed quadratic at sf0.1. Word-shingle
  MinHash banding measures 92–97 % recall against the exact τ ≥ 0.95
  pair set at linear candidate volume (135 candidates for 25 true pairs
  at sf0.01; 11 231 for 265 at sf0.1) — so blocking is lexical, exact
  verification is geometric. With a real neural encoder (where embedding
  directions are spread), the swap-in blocker is the IVF cell assignment
  from functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import dedup as _D
from fictional_guacamole_spark.functions.dedup import md5_long, sql_md5_long
from fictional_guacamole_spark.functions.text import normalize

# --- shared constants (must match the SQL renderings) -----------------------

HASH_DIM = 256         # feature-hashing bucket count for the doc embedding
TF_CAP = 255           # per-dim count clip: keeps the exact-cosine compare
                       # inside int64 — na, nb ≤ HASH_DIM·TF_CAP² ≈ 1.7e7,
                       # so 400·dot² and 361·na·nb ≤ ~1.1e17 < 2^63 (Spark's
                       # non-ANSI multiply would wrap silently and DuckDB
                       # would raise; the clip makes overflow impossible by
                       # construction, and count clipping at 255 is the
                       # standard tf saturation — near-dups still match)
W_CAP = 64             # weighted-sampling replica cap (weights clip here)


# --- weighted bottom-k sampling ---------------------------------------------

def weighted_sample_key(id_col: Column, weight_col: Column) -> Column:
    """Efraimidis–Spirakis sampling key, integer-exact: the min of
    ``w`` iid md5 draws ranks identically to ``Exp(w)`` (the E-S key).
    The weight is defensively clamped to [1, W_CAP] INSIDE the key (the
    r10 advisor found the raw form returns NULL for w ≤ 0 — array_min of
    an empty sequence — and NULLs sort first ascending, so an unclipped
    zero weight would win every bottom-k slot); callers may still
    pre-clamp, under which the inner clamp is the identity."""
    w = F.greatest(F.lit(1), F.least(F.lit(W_CAP), weight_col.cast("int")))
    draws = F.transform(
        F.sequence(F.lit(1), w),
        lambda i: md5_long(F.concat_ws(
            ":", id_col.cast("string"), i.cast("string"))))
    return F.array_min(draws)


def sql_weighted_sample_key(id_expr: str, weight_expr: str) -> str:
    """DuckDB rendering of :func:`weighted_sample_key` (identical draws,
    including the defensive [1, W_CAP] clamp)."""
    draw = sql_md5_long(
        f"CAST({id_expr} AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
    return (f"list_min(list_transform(generate_series(1, "
            f"GREATEST(1, LEAST({W_CAP}, CAST({weight_expr} AS INT)))), "
            f"i -> {draw}))")


# --- feature-hashed document embedding (sparse integer TF) ------------------

def hashed_tf(docs: DataFrame, id_col: str, text_col: str,
              dim: int = HASH_DIM) -> DataFrame:
    """Sparse feature-hashed token-count embedding: (doc, dim, c) rows.

    One explode + one map-side-combined groupBy; at 100 TB this is the
    scan-speed 'embed' stage (a real pipeline swaps in a neural encoder —
    the downstream block/verify/cluster plumbing is identical). 256 dims:
    measured at sf0.1, 64 dims let random count vectors of a shared
    vocabulary reach cos ≥ 0.95 by chance (485 'near-dup' pairs, half of
    them lexically unrelated); at 256 the chance pairs vanish (265 → the
    lexically-real set)."""
    return hashed_tf_from_words(
        _D.words_frame(docs, id_col, text_col), dim)


def hashed_tf_from_words(words: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """:func:`hashed_tf` over an existing (doc, __w) words frame (see
    ``dedup.words_frame``) — the shared-tokenize entry point (r16): a
    pipeline that also bands minhash shingles over the same documents
    caches ONE words frame and derives both, instead of re-running
    scan → normalize → split per subtree. Values are identical: the
    explode of the staged word array is the same token multiset the
    inline split produced."""
    toks = (words.select("doc", F.explode("__w").alias("t"))
            .filter(F.col("t") != ""))
    return (toks.select("doc", (md5_long(F.col("t")) % dim).alias("dim"))
            .groupBy("doc", "dim")
            .agg(F.least(F.count(F.lit(1)), F.lit(TF_CAP)).alias("c")))


def sql_hashed_tf(table: str, id_col: str, text_col: str,
                  dim: int = HASH_DIM) -> str:
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
      SELECT {id_col} AS doc, {sql_md5_long('t')} % {dim} AS dim,
             LEAST(COUNT(*), {TF_CAP}) AS c
      FROM (SELECT {id_col}, unnest(string_split({norm}, ' ')) AS t
            FROM {table}) _sem_toks
      WHERE t <> ''
      GROUP BY doc, dim"""


# --- exact integer cosine verification over blocked candidates --------------

def _dense_vectors(rows: DataFrame, val_col: str, dim: int) -> DataFrame:
    """(doc, v, n2) dense rendering of sparse (doc, dim, val) rows: ``v``
    is the length-``dim`` long array (absent dims = 0), ``n2`` the exact
    integer squared norm.

    Round-15 verify-path optimization (guide §2.3/§2.4, measured on the
    cascade's 1-gram-blocked stage: 735 K candidate pairs from 1 701
    survivor docs): the old sparse verify exploded every candidate pair
    through a per-dim equi-join (pair × nnz rows through two SMJs), then
    re-joined per-doc norms twice more — five exchanges over the pair
    set. With one dense row per doc, verification is cand ⋈ vec ⋈ vec
    and the dot runs as a fused JVM ``zip_with``/``aggregate`` over the
    array — two exchanges, no groupBy, no norm joins. The arithmetic is
    the identical exact integer sum (missing dims contribute 0), so pair
    sets are bit-equal to the sparse form the oracles replay.

    Round-16 build (guide §2.4; r15 verdict task #6): the dense array is
    assembled by a SCATTER over the dim-sorted entries — for each entry,
    emit the zero-gap since the previous dim, then the value, then pad
    the tail — so the work per doc is O(nnz + dim). The r15 form probed
    a map with ``try_element_at`` once per output slot, and Spark's map
    lookup is a linear key scan, so each doc paid O(dim × nnz)
    comparisons — measured 1.6 s for the cascade's 1 701-doc verify
    checkpoint at dim=256, and quadratic-ish if the hash dim grows.
    Entries are unique per dim (upstream groupBy) and read via O(1)
    array indexing; a −1 sentinel head makes every gap
    ``d[j] − d[j−1] − 1`` with no branch. The sentinel-padded entry
    array is STAGED as a named column before the scatter lambda (the
    measured 20× HOF pitfall: an inline concat would re-evaluate — i.e.
    re-copy — per lambda invocation, putting the quadratic right
    back)."""
    zero = F.lit(0).cast("long")
    ent = rows.groupBy("doc").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim").cast("int").alias("k"),
                                    F.col(val_col).alias("x")))).alias("e"),
        F.sum(F.col(val_col) * F.col(val_col)).alias("n2"))
    staged = ent.select(
        "doc", "n2",
        F.concat(F.array(F.struct(F.lit(-1).cast("int").alias("k"),
                                  zero.alias("x"))),
                 F.col("e")).alias("__p"))
    p = F.col("__p")
    scatter = F.flatten(F.transform(
        F.sequence(F.lit(2), F.size(p)),
        lambda j: F.concat(
            F.array_repeat(zero, F.element_at(p, j)["k"]
                           - F.element_at(p, j - 1)["k"] - 1),
            F.array(F.element_at(p, j)["x"]))))
    v = F.concat(
        scatter,
        F.array_repeat(zero, F.lit(dim - 1)
                       - F.element_at(p, F.size(p))["k"]))
    return staged.select("doc", v.alias("v"), "n2")


def _verify_pairs_dense(cand: DataFrame, vec: DataFrame, tau_num: int,
                        tau_den: int, guard_nonneg: bool) -> DataFrame:
    """Exact integer cosine ≥ tau_num/tau_den over candidate pairs and
    dense (doc, v, n2) vectors (see :func:`_dense_vectors`). Shuffled-hash
    hints on the per-doc vector side keep the r10 OOM posture (pair-shaped
    frames mis-estimate toward driver-breaking broadcasts at large SF —
    the build side here is one bounded row per DOC, never per pair) while
    skipping the sort-merge sort of the wide pair-side rows."""
    x = (vec.select(F.col("doc").alias("doc_a"), F.col("v").alias("va"),
                    F.col("n2").alias("na")).hint("shuffle_hash"))
    y = (vec.select(F.col("doc").alias("doc_b"), F.col("v").alias("vb"),
                    F.col("n2").alias("nb")).hint("shuffle_hash"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda s, p: s + p)
    j = cand.join(x, "doc_a").join(y, "doc_b").withColumn("dot", dot)
    cond = (F.lit(tau_den * tau_den) * F.col("dot") * F.col("dot")
            >= F.lit(tau_num * tau_num) * F.col("na") * F.col("nb"))
    if guard_nonneg:
        cond = (F.col("dot") >= 0) & cond
    return j.filter(cond).select("doc_a", "doc_b")


def semantic_pairs(docs: DataFrame, id_col: str, text_col: str,
                   tau_num: int = 19, tau_den: int = 20,
                   shingle_n: int = 3) -> DataFrame:
    """(doc_a, doc_b) pairs with hashed-TF cosine ≥ tau_num/tau_den:
    candidates from the MinHash band store (the sf10-proven blocking
    equi-join — see the module docstring for why sign-LSH was measured
    out), verified in EXACT integer arithmetic (cross-multiplied squares
    — count vectors are non-negative so the sign check is free).
    Default τ = 0.95.

    ``shingle_n`` picks the blocking key's shingle width: 3 (default)
    blocks on phrase overlap; 1 blocks on BAG-OF-WORDS overlap —
    order-insensitive, so it surfaces reordered/paraphrase-shaped pairs
    whose 3-gram Jaccard is low (measured at sf0.01: 48 of the 50
    cos ≥ 0.9 pairs the 3-gram stage misses band-collide under 1-gram).
    1-gram blocking is weakly selective on a small shared vocabulary
    (most same-language pairs collide), so reserve it for REDUCED
    inputs — the dedup cascade runs it over near-dup survivors only.

    100 TB shape: embed map-side → 8 band equi-joins (never all-pairs) →
    per-candidate sparse dot (equi-join on dim) → integer compare. Band
    width is the standard banding knob as the corpus grows.

    Round 16 (guide §2.4/§6): the blocking (minhash shingles) and embed
    (hashed-TF) legs both tokenize the same text; ONE cached (doc, words)
    frame now feeds both — the cache fills as a side effect of the
    verify-vector checkpoint's own materialization job, so the
    scan → normalize → split pipeline runs once instead of twice."""
    words = _D.words_frame(docs, id_col, text_col).cache()
    return semantic_pairs_from_words(words, tau_num, tau_den, shingle_n)


def semantic_pairs_from_words(words: DataFrame, tau_num: int = 19,
                              tau_den: int = 20,
                              shingle_n: int = 3) -> DataFrame:
    """:func:`semantic_pairs` over an existing (doc, __w) words frame
    (``dedup.words_frame``) — pass a CACHED/checkpointed frame when it
    feeds other consumers too (the dedup cascade shares one survivor
    token frame across its minhash AND semantic stages, r16)."""
    sig = _D.minhash_signatures_from_shingles(
        _D.shingle_rows_from_words(words, shingle_n))
    # no checkpoint on the band keys (r15): band_candidates consumes
    # them exactly once since its single-pass in-bucket expansion, so
    # the chain sig → bands → candidates is linear and an eager
    # materialization would only add a pass
    cand = _D.band_candidates(_D.minhash_band_keys(sig))
    # dense verify (r15, guide §2.3/§2.4): one (doc, v[256], n2) row per
    # doc replaces the sparse per-dim equi-join + groupBy + two norm
    # joins — identical exact integer arithmetic (absent dims add 0; a
    # zero dot can never pass the cross-multiplied compare), measured
    # 8.4 s → ~1 s on the cascade's 735 K-candidate 1-gram stage. The
    # non-negativity of counts makes the dot ≥ 0 guard unnecessary here.
    vec = (_dense_vectors(hashed_tf_from_words(words), "c", HASH_DIM)
           .localCheckpoint(eager=True))
    return _verify_pairs_dense(cand, vec, tau_num, tau_den,
                               guard_nonneg=False)


def sql_semantic_pairs(table: str, id_col: str, text_col: str,
                       tau_num: int = 19, tau_den: int = 20,
                       shingle_n: int = 3) -> str:
    """Standalone SELECT for :func:`semantic_pairs` (composable into
    sql_dedup_components' pairs slot). CTE names are module-unique (the
    DuckDB nested-CTE shadowing bug recorded in SCALE.md); the MinHash
    band SQL is the shared dedup rendering, so blocking here and in the
    judged MinHash rows cannot silently diverge."""
    sig_sql = _D.sql_minhash_signatures(table, id_col, text_col,
                                        n=shingle_n)
    band_rows = _D.sql_minhash_band_rows("semsig")
    tf = sql_hashed_tf(table, id_col, text_col)
    return f"""
    SELECT doc_a, doc_b FROM (
      WITH semsig AS MATERIALIZED ({sig_sql}),
      semband AS MATERIALIZED (
        {band_rows}),
      semcand AS MATERIALIZED (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
        FROM semband x JOIN semband y
          ON x.band = y.band AND x.band_sig = y.band_sig
             AND x.doc < y.doc),
      semtf AS MATERIALIZED ({tf}),
      semnrm AS MATERIALIZED (
        SELECT doc, SUM(c * c) AS n2 FROM semtf GROUP BY doc),
      semdot AS MATERIALIZED (
        SELECT sc.doc_a, sc.doc_b, SUM(x.c * y.c) AS dot
        FROM semcand sc
        JOIN semtf x ON x.doc = sc.doc_a
        JOIN semtf y ON y.doc = sc.doc_b AND y.dim = x.dim
        GROUP BY sc.doc_a, sc.doc_b)
      SELECT sd.doc_a, sd.doc_b
      FROM semdot sd
      JOIN semnrm na ON sd.doc_a = na.doc
      JOIN semnrm nb ON sd.doc_b = nb.doc
      WHERE {tau_den * tau_den} * dot * dot
            >= {tau_num * tau_num} * na.n2 * nb.n2) _sem_pairs"""


# --- SemDeDup over REAL embedding vectors (pretrained-encoder shape) --------
#
# The r10 semantic-dedup row embeds via hashed TF (a deterministic encoder
# stand-in) and blocks lexically because sign-LSH is scale-broken on
# hashed-TF geometry (correlated directions — measured study above). With
# PRETRAINED-style embeddings the geometry flips: directions are spread
# (the fixture's embeddings.parquet vectors are ~uniform on the sphere,
# near-dup pairs sit at cos ≥ 0.95 while random pairs sit near 0), which
# is exactly the regime where sign random projection (SRP: Charikar 2002)
# blocks at linear candidate volume. Measured on the fixture corpus:
# candidates = 3.0 % of all pairs at sf0.01 and 2.9 % at sf0.1 with
# blocking recall 100 % / 99.5 % against the exact τ ≥ 0.9 pair set —
# vs the 40 % quadratic blow-up hashed-TF sign-LSH measured in r10.
#
# Exactness engineering (everything cross-engine bit-replayable):
# - Vectors quantize to integers: q_i = FLOOR(double(x_i) · 2048).
#   float32→double is exact, ×2^11 is exact, FLOOR is exact. Unit-norm
#   inputs give |q|² ≈ 2048² ≈ 4.2e6, so the cross-multiplied cosine
#   compare 100·dot² vs 81·na·nb peaks ~1e15 ≪ 2^63 (and stays safe for
#   norms up to ~30× unit).
# - SRP planes are md5-parity Rademacher (±1) vectors: s(p, i) =
#   md5_long('semplane:p:i') % 2 · 2 − 1 — the same draw in Spark SQL,
#   DuckDB, and Python hashlib (asserted in tests), so band keys are
#   identical everywhere. Signs are integer dots (q can be negative, so
#   the verify also guards dot ≥ 0 before squaring).

SEM_SCALE = 2048       # quantization: FLOOR(x * 2^11) — exact in double
SEM_PLANES = 48        # SRP planes; 6 bands × 8 bits
SEM_BAND_W = 8         # planes per band (the banding knob: widen as the
                       # corpus grows to keep candidates linear)
SEM_DIM = 64           # fixture embedding dimensionality


def srp_plane_sign(p: int, i: int) -> int:
    """The ±1 Rademacher entry of SRP plane ``p`` at dim ``i`` — Python
    rendering of the shared md5 draw (must equal the Spark/SQL forms)."""
    import hashlib

    h = hashlib.md5(f"semplane:{p}:{i}".encode()).hexdigest()[:8]
    return int(h, 16) % 2 * 2 - 1


def quantized_embedding_rows(emb: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """(doc, dim, q) integer rows: q = FLOOR(double(x) · SEM_SCALE).
    One posexplode — scan-speed, map-only."""
    return emb.select(
        F.col(id_col).alias("doc"),
        F.posexplode(vec_col).alias("dim", "x")
    ).select("doc", "dim",
             F.floor(F.col("x").cast("double") * SEM_SCALE)
              .cast("long").alias("q"))


def sql_quantized_embedding_rows(table: str = "embeddings",
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> str:
    """DuckDB rendering of :func:`quantized_embedding_rows`."""
    return f"""
      SELECT {id_col} AS doc, i - 1 AS dim,
             CAST(FLOOR(CAST({vec_col}[i] AS DOUBLE) * {SEM_SCALE})
                  AS BIGINT) AS q
      FROM {table},
           UNNEST(generate_series(1, len({vec_col}))) AS _sq_u(i)"""


def srp_band_keys(qv: DataFrame) -> DataFrame:
    """(doc, band, band_sig) SRP banding of quantized (doc, dim, q) rows.

    The 48 plane dots are 48 fused conditional sums in ONE map-side-
    combined groupBy (plane entries are ±1 literals inlined via
    element_at, no join, no plane-table shuffle); each 8-plane band packs
    its sign bits into one integer key. Shuffle: 48 longs per vector.
    100 TB: this is the 'assign' stage — scan-speed, output ∝ vectors.
    Prefer :func:`srp_band_keys_dense` when the vector is already a
    dense array column — it skips this path's explode + groupBy shuffle
    entirely (r15, guide §2.4)."""
    planes = [
        F.array(*[F.lit(srp_plane_sign(p, i)) for i in range(SEM_DIM)])
        for p in range(SEM_PLANES)
    ]
    dots = [
        F.sum(F.col("q") * F.element_at(planes[p], F.col("dim") + 1))
         .alias(f"d{p}")
        for p in range(SEM_PLANES)
    ]
    sig = qv.groupBy("doc").agg(*dots)
    return _srp_bands_from_dots(sig)


def _srp_bands_from_dots(sig: DataFrame) -> DataFrame:
    """(doc, band, band_sig) from a frame carrying d0..d47 plane dots:
    each 8-plane band packs its sign bits into one integer key."""
    n_bands = SEM_PLANES // SEM_BAND_W
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            sum((F.when(F.col(f"d{b * SEM_BAND_W + j}") >= 0, 1 << j)
                 .otherwise(0)) for j in range(SEM_BAND_W))
            .cast("long").alias("band_sig"))
        for b in range(n_bands)
    ]
    return (sig.select("doc", F.explode(F.array(*band_structs)).alias("bs"))
            .select("doc", F.col("bs.band").alias("band"),
                    F.col("bs.band_sig").alias("band_sig")))


def quantized_embeddings_dense(emb: DataFrame, id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """(doc, v) DENSE integer quantization of float embedding arrays:
    v[i] = FLOOR(double(x_i) · SEM_SCALE), computed as one map-side
    ``transform`` over the array — no posexplode, no shuffle (r15,
    guide §2.4; contrast :func:`quantized_embedding_rows`, which renders
    the exploded (doc, dim, q) rows the k-means / decon dot joins need)."""
    return emb.select(
        F.col(id_col).alias("doc"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * SEM_SCALE).cast("long")
        ).alias("v"))


def srp_band_keys_dense(qdense: DataFrame) -> DataFrame:
    """(doc, band, band_sig) SRP banding of DENSE (doc, v) quantized
    vectors: one posexplode into the same 48-fused-conditional-sum
    groupBy as :func:`srp_band_keys`. Measured alternative (r15, sf0.1,
    2 400 docs × 64 dims): computing the 48 plane dots as in-array
    ``zip_with``/``aggregate`` folds (zero-shuffle) matches this shape
    warm (~0.9 s) but pays ~5 s of first-execution codegen for the 48
    fold lambdas — a once-per-session cost the per-pass bench protocol
    re-pays, so the explode+groupBy aggregation (cheap codegen, map-side
    combined, one skinny shuffle of docs × dims longs) stays. The dots
    are identical exact integer sums either way."""
    ex = qdense.select("doc", F.posexplode("v").alias("dim", "q"))
    planes = [
        F.array(*[F.lit(srp_plane_sign(p, i)) for i in range(SEM_DIM)])
        for p in range(SEM_PLANES)
    ]
    dots = [
        F.sum(F.col("q") * F.element_at(planes[p], F.col("dim") + 1))
         .alias(f"d{p}")
        for p in range(SEM_PLANES)
    ]
    return _srp_bands_from_dots(ex.groupBy("doc").agg(*dots))


def sql_srp_band_keys(qv_cte: str) -> str:
    """DuckDB rendering of :func:`srp_band_keys` over a (doc, dim, q) CTE
    — the oracle uses the plane-table join form (same md5 draws, same
    band keys; join-vs-inline is a physical choice, not semantic)."""
    sgn = sql_md5_long(
        "'semplane:' || CAST(_sp.p AS VARCHAR) || ':' "
        "|| CAST(_sd.i AS VARCHAR)")
    return f"""
      SELECT doc, p // {SEM_BAND_W} AS band,
             SUM((CASE WHEN d >= 0 THEN 1 ELSE 0 END)
                 * (1 << (p % {SEM_BAND_W}))) AS band_sig
      FROM (
        SELECT qv.doc, pl.p, SUM(qv.q * pl.s) AS d
        FROM {qv_cte} qv
        JOIN (SELECT _sp.p, _sd.i AS dim, {sgn} % 2 * 2 - 1 AS s
              FROM (SELECT unnest(generate_series(0, {SEM_PLANES - 1}))
                      AS p) _sp,
                   (SELECT unnest(generate_series(0, {SEM_DIM - 1}))
                      AS i) _sd) pl
          ON qv.dim = pl.dim
        GROUP BY qv.doc, pl.p) _srp_dots
      GROUP BY doc, band"""


def semantic_pairs_embeddings(qdense: DataFrame, tau_num: int = 9,
                              tau_den: int = 10) -> DataFrame:
    """(doc_a, doc_b) pairs of DENSE quantized embedding vectors
    (doc, v — :func:`quantized_embeddings_dense`) with exact integer
    cosine ≥ tau_num/tau_den, candidates from SRP banding (never
    all-pairs). The verify guards dot ≥ 0 before the cross-multiplied
    square compare — embedding coordinates are signed, unlike the
    non-negative hashed-TF counts in :func:`semantic_pairs`.

    Round-15 shape (guide §2.4): quantization stays on the dense array
    (a map-side ``transform`` — no posexplode rebuild of the vector),
    the SRP dots run in ONE exploded groupBy (srp_band_keys_dense), the
    verify reads v directly with n2 as a single in-array fold — so the
    old shape's exploded (doc, dim, q) frame, its second groupBy
    (map_from_entries vector rebuild) and all three eager
    localCheckpoints are gone; the band-key frame feeds exactly one
    consumer (band_candidates' single-pass in-bucket expansion) and the
    per-doc verify sides are cheap map-side recomputes of a pruned
    scan, so nothing here is worth a checkpoint. Measured at sf0.1
    (steady-state bench-pass protocol, full judged row): 7.6 s → 6.3 s
    per pass; pair set bit-equal (398 = 398 at sf0.1).

    100 TB shape: assign (map-side quantize + one skinny dots shuffle)
    → 6 band equi-joins → dense dot over blocked pairs only → integer
    compare."""
    bk = srp_band_keys_dense(qdense)
    cand = _D.band_candidates(bk)
    n2 = F.aggregate("v", F.lit(0).cast("long"),
                     lambda s, x: s + x * x).alias("n2")
    vec = qdense.select("doc", "v", n2)
    return _verify_pairs_dense(cand, vec, tau_num, tau_den,
                               guard_nonneg=True)


def sql_semantic_pairs_embeddings(qv_sql: str, tau_num: int = 9,
                                  tau_den: int = 10) -> str:
    """Standalone SELECT for :func:`semantic_pairs_embeddings` over a
    quantized-rows SELECT (CTE names prefixed ``semp_`` — shadow-safe)."""
    return f"""
    SELECT doc_a, doc_b FROM (
      WITH semp_qv AS MATERIALIZED ({qv_sql}),
      semp_bands AS MATERIALIZED (
        {sql_srp_band_keys('semp_qv')}),
      semp_cand AS MATERIALIZED (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
        FROM semp_bands x JOIN semp_bands y
          ON x.band = y.band AND x.band_sig = y.band_sig
             AND x.doc < y.doc),
      semp_nrm AS MATERIALIZED (
        SELECT doc, SUM(q * q) AS n2 FROM semp_qv GROUP BY doc),
      semp_dot AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b, SUM(x.q * y.q) AS dot
        FROM semp_cand c
        JOIN semp_qv x ON x.doc = c.doc_a
        JOIN semp_qv y ON y.doc = c.doc_b AND y.dim = x.dim
        GROUP BY c.doc_a, c.doc_b)
      SELECT sd.doc_a, sd.doc_b
      FROM semp_dot sd
      JOIN semp_nrm na ON sd.doc_a = na.doc
      JOIN semp_nrm nb ON sd.doc_b = nb.doc
      WHERE sd.dot >= 0
        AND {tau_den * tau_den} * sd.dot * sd.dot
            >= {tau_num * tau_num} * na.n2 * nb.n2) _semp_pairs"""


# --- sqrt-temperature Hamilton apportionment (shared by both mix rows) ------

def temperature_alloc(grouped: DataFrame, key_col: str,
                      budget_div: int) -> DataFrame:
    """(key, alloc) quotas for α=0.5 temperature mixing: weights are
    integer square roots of group sizes (IEEE-CR sqrt under FLOOR),
    quotas are Hamilton largest-remainder apportionment of
    ``total // budget_div``, and every quota is CLAMPED to its group
    size (a tiny heavily-up-weighted domain cannot be allocated more
    docs than it has; the clamped surplus is deliberately NOT
    reassigned — the manifest under-fills rather than silently
    re-skewing the mixture, and the shortfall is visible as
    sum(alloc) < budget). ONE implementation feeds both judged mix rows
    and their oracles compose :func:`sql_temperature_alloc`, so the
    clamp semantics cannot drift between siblings.

    ``grouped``: one row per key with an ``n_d`` count column."""
    counts = grouped.withColumn(
        "w_d", F.floor(F.sqrt(F.col("n_d").cast("double"))).cast("long"))
    # integer division (DIV), matching the oracle's `//` exactly for ANY
    # divisor — the double-division form only agreed because current call
    # sites pass power-of-two divisors with totals under 2^53 (r10 advice)
    tot = counts.agg(
        F.sum("w_d").alias("w_sum"),
        F.expr(f"sum(n_d) DIV {budget_div}").alias("budget"))
    quota = (counts.join(F.broadcast(tot))
             .select(key_col, "n_d",
                     F.expr("(budget * w_d) DIV w_sum").alias("base"),
                     F.expr("(budget * w_d) % w_sum").alias("rem"),
                     F.col("budget")))
    wq = W.orderBy(F.desc("rem"), F.asc(key_col))
    return (quota
            .withColumn("leftover",
                        F.col("budget") - F.sum("base").over(W.partitionBy()))
            .withColumn(
                "alloc",
                F.least(
                    F.col("n_d"),
                    F.col("base") + F.when(
                        F.row_number().over(wq) <= F.col("leftover"),
                        F.lit(1)).otherwise(F.lit(0))))
            .select(key_col, "alloc"))


def sql_temperature_alloc(grouped_cte: str, key_col: str,
                          budget_div: int) -> str:
    """DuckDB rendering of :func:`temperature_alloc` — identical
    arithmetic over a CTE with (key, n_d) rows; emits the counts→alloc
    CTE chain (names prefixed ``ta_`` to stay shadow-safe)."""
    return f"""
    ta_counts AS (
      SELECT {key_col}, n_d,
             CAST(FLOOR(SQRT(CAST(n_d AS DOUBLE))) AS BIGINT) AS w_d
      FROM {grouped_cte}),
    ta_tot AS (
      SELECT SUM(w_d) AS w_sum, SUM(n_d) // {budget_div} AS budget
      FROM ta_counts),
    ta_quota AS (
      SELECT {key_col}, n_d,
             (budget * w_d) // w_sum AS base,
             (budget * w_d) % w_sum AS rem,
             budget - SUM((budget * w_d) // w_sum) OVER () AS leftover
      FROM ta_counts, ta_tot),
    ta_alloc AS (
      SELECT {key_col},
             LEAST(n_d, base
                   + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC,
                                                  {key_col})
                               <= leftover THEN 1 ELSE 0 END) AS alloc
      FROM ta_quota)"""


# --- UniMax: epoch-capped uniform mixing (water-filling) --------------------
#
# Chung et al. 2023, "UniMax: Fairer and More Effective Language Sampling
# for Large-Scale Multilingual Pretraining": share the training budget as
# uniformly as possible across domains, but never sample any domain for
# more than N epochs. The allocation is the classic water-filling: raise a
# common level until each domain either reaches the level or saturates at
# its epoch cap. Sorting domains by capacity makes the saturated set a
# PREFIX of the ordering, so the whole allocation is two window passes —
# no iteration, no driver-side loop — and exactly integer-reproducible in
# both engines (DIV/% on int64).


def unimax_alloc(grouped: DataFrame, key_col: str, epoch_cap: int,
                 budget_div: int) -> DataFrame:
    """(key, n_d, cap_docs, alloc) UniMax quotas over (key, n_d) rows.

    ``budget = total_docs DIV budget_div``; ``cap_docs = epoch_cap * n_d``.
    Saturation test for the j-th domain in (cap, key) order: giving every
    not-yet-processed domain this domain's capacity still fits the
    remaining budget (``cap_j * (D - j + 1) <= budget - prefix_{j-1}``) —
    monotone in j, so saturated domains are exactly the first k rows.
    Uncapped domains split the remainder evenly (base = DIV, first
    ``rem`` of them by the same ordering get +1; the +1 can never exceed
    a capacity because every uncapped capacity strictly exceeds the real
    water level). ``sum(alloc) = min(budget, sum(cap_docs))`` exactly.
    """
    counts = grouped.select(
        key_col, "n_d", (F.col("n_d") * epoch_cap).alias("cap_docs"))
    tot = counts.agg(
        F.count(F.lit(1)).alias("n_dom"),
        F.expr(f"sum(n_d) DIV {budget_div}").alias("budget"))
    wo = W.orderBy("cap_docs", key_col)
    staged = (counts.join(F.broadcast(tot))
              .select(key_col, "n_d", "cap_docs", "n_dom", "budget",
                      F.row_number().over(wo).alias("j"),
                      F.coalesce(
                          F.sum("cap_docs").over(
                              wo.rowsBetween(W.unboundedPreceding, -1)),
                          F.lit(0)).alias("prefix")))
    flagged = staged.select(
        "*",
        (F.col("cap_docs") * (F.col("n_dom") - F.col("j") + 1)
         <= F.col("budget") - F.col("prefix")).cast("int").alias("sat"))
    wall = W.partitionBy()
    leveled = flagged.select(
        "*",
        F.sum("sat").over(wall).alias("k_sat"),
        F.coalesce(F.sum(F.when(F.col("sat") == 1, F.col("cap_docs")))
                    .over(wall), F.lit(0)).alias("s_sat"))
    base = F.expr("(budget - s_sat) DIV greatest(n_dom - k_sat, 1)")
    rem = F.expr("(budget - s_sat) % greatest(n_dom - k_sat, 1)")
    return (leveled.select(
        key_col, "n_d", "cap_docs",
        F.when(F.col("sat") == 1, F.col("cap_docs"))
         .otherwise(base + F.when(F.col("j") - F.col("k_sat") <= rem,
                                  F.lit(1)).otherwise(F.lit(0)))
         .cast("long").alias("alloc")))


def sql_unimax_alloc(grouped_cte: str, key_col: str, epoch_cap: int,
                     budget_div: int) -> str:
    """DuckDB rendering of :func:`unimax_alloc` — identical window-pass
    arithmetic over a (key, n_d) CTE; emits a ``ux_``-prefixed CTE chain
    ending in ``ux_alloc`` with (key, n_d, cap_docs, alloc)."""
    return f"""
    ux_counts AS (
      SELECT {key_col}, n_d, n_d * {epoch_cap} AS cap_docs
      FROM {grouped_cte}),
    ux_tot AS (
      SELECT COUNT(*) AS n_dom, SUM(n_d) // {budget_div} AS budget
      FROM ux_counts),
    ux_staged AS (
      SELECT {key_col}, n_d, cap_docs, n_dom, budget,
             ROW_NUMBER() OVER (ORDER BY cap_docs, {key_col}) AS j,
             COALESCE(SUM(cap_docs) OVER (
               ORDER BY cap_docs, {key_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM ux_counts, ux_tot),
    ux_flagged AS (
      SELECT *, CASE WHEN cap_docs * (n_dom - j + 1) <= budget - prefix
                     THEN 1 ELSE 0 END AS sat
      FROM ux_staged),
    ux_leveled AS (
      SELECT *, SUM(sat) OVER () AS k_sat,
             COALESCE(SUM(CASE WHEN sat = 1 THEN cap_docs END) OVER (), 0)
               AS s_sat
      FROM ux_flagged),
    ux_alloc AS (
      SELECT {key_col}, n_d, cap_docs,
             CAST(CASE WHEN sat = 1 THEN cap_docs
                  ELSE (budget - s_sat) // GREATEST(n_dom - k_sat, 1)
                       + CASE WHEN j - k_sat <=
                                (budget - s_sat) % GREATEST(n_dom - k_sat, 1)
                              THEN 1 ELSE 0 END
                  END AS BIGINT) AS alloc
      FROM ux_leveled)"""


# --- distributed Lloyd k-means over quantized embeddings --------------------
#
# The cluster-then-verify family (SemDeDup clusters embeddings before its
# pairwise stage; corpus balancing buckets by centroid) needs k-means run
# over the WHOLE corpus, not the 4096-row driver-side sample the IVF
# trainer uses (similarity.py — fine for codebook training, not for
# full-corpus assignment studies). This is the fully-distributed form:
# centroids broadcast, assignment is a map-side expand x k + one groupBy,
# the update one more groupBy — per round, two shuffles whose width is
# vectors x k and k x dims. All arithmetic is int64 over the shared
# FLOOR(x*2048) quantization, with truncating integer division (Spark DIV
# == DuckDB //, verified for negatives), so every round is bit-exact in
# both engines and the oracle replays the identical unrolled iteration.

KMEANS_K = 8


def kmeans_assign(qv: DataFrame, cent: DataFrame) -> DataFrame:
    """(doc, cid, dist) nearest-centroid assignment of quantized (doc,
    dim, q) rows to broadcast (cid, dim, cq) centroids; ties break to the
    smallest cid. dist is the exact int64 squared L2 distance."""
    j = qv.join(F.broadcast(cent), "dim")
    d = (j.groupBy("doc", "cid")
         .agg(F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq")))
              .cast("long").alias("dist")))
    wmin = W.partitionBy("doc").orderBy("dist", "cid")
    return (d.withColumn("rn", F.row_number().over(wmin))
            .filter(F.col("rn") == 1).drop("rn"))


def kmeans_update(qv: DataFrame, assign: DataFrame) -> DataFrame:
    """(cid, dim, cq) centroid update: truncating integer mean of member
    coordinates (empty clusters simply vanish — deterministic in both
    engines)."""
    return (qv.join(assign.select("doc", "cid"), "doc")
            .groupBy("cid", "dim")
            .agg(F.expr("sum(q) DIV count(1)").alias("cq")))


def kmeans_rounds(qv: DataFrame, k: int = KMEANS_K,
                  rounds: int = 2) -> DataFrame:
    """Final (doc, cid, dist) after ``rounds`` Lloyd iterations seeded
    from the ``k`` smallest doc ids' vectors (deterministic init — the
    quantized fixture vectors are ~uniform on the sphere, so low ids are
    as unbiased a seed as any, and both engines agree on it exactly)."""
    seed_ids = (qv.select("doc").distinct().orderBy("doc").limit(k)
                .withColumn("cid", F.row_number().over(W.orderBy("doc")) - 1))
    cent = (qv.join(F.broadcast(seed_ids), "doc")
            .select("cid", "dim", F.col("q").alias("cq")))
    assign = kmeans_assign(qv, cent)
    for _ in range(rounds - 1):
        cent = kmeans_update(qv, assign)
        assign = kmeans_assign(qv, cent)
    return assign


def sql_kmeans_rounds(qv_cte: str, k: int = KMEANS_K,
                      rounds: int = 2) -> str:
    """DuckDB rendering of :func:`kmeans_rounds`: the identical unrolled
    iteration as a ``km_``-prefixed CTE chain ending in ``km_assign``
    with (doc, cid, dist)."""
    parts = [f"""
    km_seed AS (
      SELECT doc, ROW_NUMBER() OVER (ORDER BY doc) - 1 AS cid
      FROM (SELECT DISTINCT doc FROM {qv_cte} ORDER BY doc LIMIT {k})),
    km_cent_0 AS (
      SELECT cid, dim, q AS cq
      FROM {qv_cte} JOIN km_seed USING (doc))"""]
    for r in range(rounds):
        parts.append(f"""
    km_dist_{r} AS (
      SELECT doc, cid, SUM((q - cq) * (q - cq)) AS dist
      FROM {qv_cte} JOIN km_cent_{r} USING (dim)
      GROUP BY doc, cid),
    km_assign_{r} AS (
      SELECT doc, cid, CAST(dist AS BIGINT) AS dist
      FROM (SELECT doc, cid, dist, ROW_NUMBER() OVER (
              PARTITION BY doc ORDER BY dist, cid) AS rn
            FROM km_dist_{r})
      WHERE rn = 1)""")
        if r < rounds - 1:
            parts.append(f"""
    km_cent_{r + 1} AS (
      SELECT cid, dim, SUM(q) // COUNT(*) AS cq
      FROM {qv_cte} JOIN km_assign_{r} USING (doc)
      GROUP BY cid, dim)""")
    parts.append(f"""
    km_assign AS (SELECT * FROM km_assign_{rounds - 1})""")
    return ",".join(parts)

"""Round-10 judged rows: the corpus-curation SELECTION layer (weighted
sampling, temperature mixing, semantic dedup, DSIR importance resampling,
incremental near-dup ingest, the capstone manifest) plus the lakehouse
reads that make curated corpora REPRODUCIBLE (time travel, change data
feed).

These extend the LLM-data-pipeline surface (SURVEY.md §2.5) past near-dup
removal into selection: which documents, from which domains, in what
proportion, actually enter the training corpus — and how to pin or
replicate exactly that corpus later. All rows are full value oracles —
see functions/curation.py for the integer-exactness engineering that
makes lossy-looking operations (weighted sampling, temperature mixing,
cosine thresholds, log-ratio scoring) bit-replayable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import curation as C
from fictional_guacamole_spark.functions import dedup as D
from fictional_guacamole_spark.functions import text as X
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table

_SAMPLE_K = 100

_TOKN_SQL = (f"len(regexp_extract_all("
             f"trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), "
             f"'{X.TOKEN_PATTERN}'))")


@query(
    "sample_weighted_bottomk",
    survey_ref="extensions: weighted reservoir sampling "
               "(Efraimidis–Spirakis bottom-k, integer-exact)",
    description="Top-100 token-count-weighted sample via min-of-w md5 "
                "draws (exact E-S key order, no floats)",
    oracle=f"""
    WITH wts AS (
      SELECT doc_id AS doc,
             GREATEST(1, LEAST({C.W_CAP}, {_TOKN_SQL})) AS weight
      FROM documents),
    keyed AS (
      SELECT doc, weight,
             {C.sql_weighted_sample_key('doc', 'weight')} AS sample_key
      FROM wts),
    ranked AS (
      SELECT doc, weight, sample_key,
             ROW_NUMBER() OVER (ORDER BY sample_key, doc) AS rank
      FROM keyed)
    SELECT doc, CAST(weight AS BIGINT) AS weight, sample_key,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {_SAMPLE_K}
    ORDER BY rank
    """,
)
def sample_weighted_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement — the curation primitive
    behind quality-weighted corpus selection ('sample documents with
    probability ∝ quality×length'). Key design (functions/curation.py):
    the Efraimidis–Spirakis key u^(1/w) is order-equivalent to the MIN of
    w iid uniforms, realized as integer md5 draws — so selection is exact
    integer comparison, immune to pow/log rounding skew between engines.

    100 TB shape: ≤ W_CAP md5s per doc computed map-side, then ONE
    TakeOrderedAndProject for the global bottom-k — the corpus never
    shuffles, and the sample merges associatively (per-partition bottom-k
    then re-take, the same property KMV exploits)."""
    docs = load_table(spark, sf_dir, "documents")
    wts = docs.select(
        F.col("doc_id").alias("doc"),
        F.greatest(F.lit(1),
                   F.least(F.lit(C.W_CAP), X.token_count(F.col("text"))))
         .cast("long").alias("weight"))
    keyed = wts.select(
        "doc", "weight",
        C.weighted_sample_key(F.col("doc"), F.col("weight"))
         .alias("sample_key"))
    # limit-then-rank: the global selection is TakeOrdered (no total sort);
    # the rank window then runs over only the k survivors.
    topk = keyed.orderBy("sample_key", "doc").limit(_SAMPLE_K)
    w = W.orderBy("sample_key", "doc")
    return (topk.withColumn("rank", F.row_number().over(w).cast("int"))
            .orderBy("rank"))


@query(
    "pipeline_temperature_mix",
    survey_ref="extensions: temperature-scaled domain mixing "
               "(α=0.5 multinomial, exact largest-remainder apportionment)",
    description="Quarter-corpus budget apportioned across skewed domains "
                "with p_d ∝ sqrt(n_d), docs picked by md5 rank",
    oracle=f"""
    WITH doms AS (
      SELECT doc_id AS doc,
             'd' || CAST(CAST(FLOOR(SQRT(CAST(substr(source, 4) AS DOUBLE)))
                              AS INT) AS VARCHAR) AS domain
      FROM documents),
    dom_counts AS (
      SELECT domain, COUNT(*) AS n_d FROM doms GROUP BY domain),
    {C.sql_temperature_alloc('dom_counts', 'domain', budget_div=4)},
    picked AS (
      SELECT d.doc, d.domain, a.alloc,
             ROW_NUMBER() OVER (
               PARTITION BY d.domain
               ORDER BY {D.sql_md5_long('CAST(d.doc AS VARCHAR)')},
                        d.doc) AS pick_rank
      FROM doms d JOIN ta_alloc a USING (domain))
    SELECT doc, domain, CAST(alloc AS BIGINT) AS alloc,
           CAST(pick_rank AS INTEGER) AS pick_rank
    FROM picked WHERE pick_rank <= alloc
    ORDER BY doc
    """,
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (XLM / mT5's α-sampling) with
    α=0.5: small domains are up-weighted relative to their share
    (p_d ∝ √n_d), the standard fix for head-domain dominance in
    multi-source corpora. Unlike pipeline_domain_mix (rate-based hash
    sampling — expected counts), this row apportions an EXACT budget:
    integer square roots (IEEE-correctly-rounded sqrt under FLOOR),
    Hamilton largest-remainder rounding, and within-domain picks by md5
    rank. Quotas CLAMP at domain size (the shared
    functions/curation.py::temperature_alloc — one implementation with
    the capstone, so the clamp semantics cannot drift): a tiny
    up-weighted domain can never be allocated more docs than it has,
    and a clamped surplus shows as sum(alloc) < budget instead of
    silently re-skewing the mixture. The fixture's sources are uniform,
    so the domain key sqrt-buckets the source index into authentically
    skewed groups (25/75/125/175/100 at sf0.01 — no clamp fires there;
    the clamp path is unit-tested on a 1-doc domain).

    100 TB shape: the quota table is |domains| rows (KBs, broadcast);
    the pick is one md5 projection + one per-domain window — at scale the
    window becomes a per-domain TakeOrdered since alloc ≪ n_d."""
    docs = load_table(spark, sf_dir, "documents")
    doms = docs.select(
        F.col("doc_id").alias("doc"),
        F.concat(F.lit("d"),
                 F.floor(F.sqrt(F.expr(
                     "CAST(substring(source, 4) AS DOUBLE)")))
                  .cast("int").cast("string")).alias("domain"))
    counts = doms.groupBy("domain").agg(F.count(F.lit(1)).alias("n_d"))
    alloc = C.temperature_alloc(counts, "domain", budget_div=4)
    wp = W.partitionBy("domain").orderBy(
        D.md5_long(F.col("doc").cast("string")), F.asc("doc"))
    return (doms.join(F.broadcast(alloc), "domain")
            .withColumn("pick_rank", F.row_number().over(wp).cast("int"))
            .filter(F.col("pick_rank") <= F.col("alloc"))
            .select("doc", "domain", F.col("alloc").cast("long").alias("alloc"),
                    "pick_rank")
            .orderBy("doc"))


_SEM_PAIRS_SQL = C.sql_semantic_pairs("documents", "doc_id", "text")


@query(
    "dedup_semantic_embedding",
    survey_ref="extensions: semantic dedup (SemDeDup-shaped: embed → "
               "block → exact-cosine verify → cluster → keep-one)",
    description="Embedding-space near-dup clusters: 256-dim hashed-TF "
                "vectors, MinHash-band blocking, integer-exact cosine "
                "≥ 0.95, components labeling with cluster sizes",
    oracle=f"""
    WITH comp AS ({D.sql_dedup_components(
        _SEM_PAIRS_SQL, "documents", "doc_id")})
    SELECT doc, canonical_id AS cluster,
           (doc = canonical_id) AS is_rep,
           CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
             AS n_members
    FROM comp
    ORDER BY doc
    """,
)
def dedup_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): near-duplicate
    CLUSTERS certified in embedding space. The judged pipeline embeds
    every doc as a 256-dim feature-hashed token-count vector (the
    deterministic stand-in for a neural encoder; the downstream plumbing
    is encoder-agnostic), generates candidates with the sf10-proven
    MinHash band equi-join (sign-LSH was MEASURED OUT — 40 % of all
    pairs surfaced as candidates on this corpus; study in SCALE.md and
    functions/curation.py), verifies cosine ≥ 0.95 in EXACT integer
    arithmetic (400·dot² ≥ 361·|a|²·|b|², overflow-proof via the TF_CAP
    count clip — no float compare anywhere), labels clusters with the
    judged components pass, and emits each doc's cluster, representative
    flag, and cluster size.

    100 TB shape: embed at scan speed (one explode + map-side-combined
    groupBy); candidates are 8 banded equi-joins — all-pairs never
    materializes; verification touches only blocked pairs via a sparse
    dim equi-join; components is the already-sf10-proven distributed
    labeling. State per doc beyond the scan: K=32 signature longs."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = C.semantic_pairs(docs, "doc_id", "text")
    comp = D.dedup_components(pairs, docs.select("doc_id"))
    wc = W.partitionBy("cluster")
    return (comp.select("doc", F.col("canonical_id").alias("cluster"))
            .withColumn("is_rep", F.col("doc") == F.col("cluster"))
            .withColumn("n_members",
                        F.count(F.lit(1)).over(wc).cast("long"))
            .orderBy("doc"))


# -- SemDeDup over the REAL embedding vectors (r10 verdict task #1) ----------
# The corpus: every fixture vector, plus — for vec_id % 5 == 0 — one
# deterministic NEAR-DUPLICATE replica (id + 100000) whose coordinate
# (vec_id % 64) is doubled before quantization. The fixture vectors are
# ~uniform unit vectors (max pairwise cos ≈ 0.5 at judged SFs), so without
# injected near-dups a τ = 0.9 SemDeDup pass would be vacuously empty;
# the doubled-coordinate replica lands at cos ∈ [0.956, 1) of its original
# (measured) — the classic near-dup regime — while replica–stranger pairs
# stay random. The SAME derivation runs in both engines, so the oracle is
# a full value oracle (same pattern as the doubled-replay streaming rows).
_SEMP_STRIDE = 100000
_SEMP_QV_SQL = f"""
      SELECT vec_id AS doc, i - 1 AS dim,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {C.SEM_SCALE})
                  AS BIGINT) AS q
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS _sq_u(i)
      UNION ALL
      SELECT vec_id + {_SEMP_STRIDE}, i - 1,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {C.SEM_SCALE}
                  * (CASE WHEN i - 1 = vec_id % {C.SEM_DIM} THEN 2 ELSE 1
                     END)) AS BIGINT)
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS _sq_u(i)
      WHERE vec_id % 5 = 0"""
_SEMP_IDS_SQL = (f"(SELECT vec_id FROM embeddings UNION ALL "
                 f"SELECT vec_id + {_SEMP_STRIDE} FROM embeddings "
                 f"WHERE vec_id % 5 = 0) _semp_ids")
_SEMP_PAIRS_SQL = C.sql_semantic_pairs_embeddings(_SEMP_QV_SQL)


@query(
    "dedup_semantic_pretrained",
    survey_ref="extensions: semantic dedup over REAL embedding vectors "
               "(SemDeDup production shape: pretrained-style embeddings, "
               "SRP banding, integer-exact cosine verify, components)",
    description="Embedding-space near-dup clusters over the fixture's "
                "embeddings.parquet vectors + doubled-coordinate replicas: "
                "FLOOR(x*2048) quantization, 6x8 sign-random-projection "
                "bands, exact integer cosine >= 0.9, components labeling",
    oracle=f"""
    WITH comp AS ({D.sql_dedup_components(
        _SEMP_PAIRS_SQL, _SEMP_IDS_SQL, "vec_id")})
    SELECT doc, canonical_id AS cluster,
           (doc = canonical_id) AS is_rep,
           CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
             AS n_members
    FROM comp
    ORDER BY doc
    """,
)
def dedup_semantic_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) in its PRODUCTION shape — over real
    (pretrained-encoder-style) embedding vectors, not the r10 row's
    hashed-TF stand-in. The pipeline: quantize each float vector to
    integers (FLOOR(x·2048) — exact in double, so both engines see
    bit-identical vectors), block candidates with 6×8 sign-random-
    projection bands (md5-parity Rademacher planes — SRP works HERE
    because neural-style embedding directions are spread; the r10 study
    measured it quadratic on hashed-TF geometry and chose lexical
    blocking there), verify cosine ≥ 0.9 in exact integer arithmetic
    (dot ≥ 0 guard + 100·dot² ≥ 81·na·nb), label clusters with the
    judged components pass. Measured on this corpus: candidates are
    3.0 % / 2.9 % of all pairs at sf0.01 / sf0.1 with 100 % / 99.5 %
    blocking recall vs the exact τ pair set — sub-100 % recall is
    inherent to SemDeDup-style blocking and deterministic here (both
    engines replay the identical banding).

    100 TB shape: quantize + 48 plane dots are map-side (fused
    conditional sums, plane literals inlined — no plane-table join);
    candidates are 6 banded equi-joins, never all-pairs; verify touches
    only blocked pairs via the sparse dim equi-join; components is the
    sf10-proven distributed labeling. SEM_BAND_W is the knob that keeps
    candidate volume linear as the corpus grows."""
    # re-split before the SRP dots stage: the raw scan's few input
    # splits would otherwise cap the map parallelism (same sf10 lesson
    # as the cascade's survivor repartition); the count is pinned to
    # cores so AQE's byte-based coalescing cannot single-thread the
    # CPU-bound stage at small byte volumes (r15, guide §2.6)
    emb = (load_table(spark, sf_dir, "embeddings")
           .repartition(spark.sparkContext.defaultParallelism,
                        F.col("vec_id")))
    # r15 (guide §2.4): quantization stays on the DENSE array — one
    # map-side transform per branch (the replica's doubled coordinate is
    # an index-aware transform), no posexplode, no groupBy rebuild. The
    # per-element arithmetic is unchanged, so vectors are bit-equal to
    # the exploded form the oracle replays.
    qd_orig = C.quantized_embeddings_dense(emb)
    rep = emb.filter(F.col("vec_id") % 5 == 0)
    qd_rep = rep.select(
        (F.col("vec_id") + _SEMP_STRIDE).alias("doc"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.floor(
                x.cast("double") * C.SEM_SCALE
                * F.when(i == F.col("vec_id") % C.SEM_DIM, 2).otherwise(1)
            ).cast("long")).alias("v"))
    qdense = qd_orig.unionByName(qd_rep)
    pairs = C.semantic_pairs_embeddings(qdense)
    ids = (emb.select(F.col("vec_id"))
           .unionByName(rep.select(
               (F.col("vec_id") + _SEMP_STRIDE).alias("vec_id"))))
    comp = D.dedup_components(pairs, ids)
    wc = W.partitionBy("cluster")
    return (comp.select("doc", F.col("canonical_id").alias("cluster"))
            .withColumn("is_rep", F.col("doc") == F.col("cluster"))
            .withColumn("n_members",
                        F.count(F.lit(1)).over(wc).cast("long"))
            .orderBy("doc"))


_MH_AGREE = " + ".join(
    f"(CASE WHEN sn.m{i} = sh.m{i} THEN 1 ELSE 0 END)"
    for i in range(D.MINHASH_K))
_MH_BANDS = D.sql_minhash_band_rows("msig")


@query(
    "dedup_incremental_minhash",
    survey_ref="extensions: incremental NEAR-dup ingest (new batch probed "
               "against the persisted MinHash band store)",
    description="Incoming docs (id >= 300) matched against the historical "
                "band store (id < 300): novel flag + best near-dup match",
    oracle=f"""
    WITH msig AS MATERIALIZED (
      {D.sql_minhash_signatures('documents', 'doc_id', 'text', n=3)}),
    mbands AS MATERIALIZED (
      {_MH_BANDS}),
    cand AS MATERIALIZED (
      SELECT DISTINCT x.doc AS doc, y.doc AS hist_doc
      FROM mbands x JOIN mbands y
        ON x.band = y.band AND x.band_sig = y.band_sig
      WHERE x.doc >= 300 AND y.doc < 300),
    est AS (
      SELECT c.doc, c.hist_doc,
             CAST(({_MH_AGREE}) AS DOUBLE) / {D.MINHASH_K} AS est_jaccard
      FROM cand c JOIN msig sn ON sn.doc = c.doc
                  JOIN msig sh ON sh.doc = c.hist_doc),
    best AS (
      SELECT doc, hist_doc, est_jaccard,
             ROW_NUMBER() OVER (PARTITION BY doc
                                ORDER BY est_jaccard DESC, hist_doc) AS rn
      FROM est WHERE est_jaccard >= 0.5)
    SELECT d.doc_id AS doc,
           (b.hist_doc IS NULL) AS novel,
           b.hist_doc AS best_match,
           b.est_jaccard AS best_est
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc
    WHERE d.doc_id >= 300
    ORDER BY doc
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingestion — the nightly-crawl shape at 100 TB:
    the corpus-so-far is represented by its persisted MinHash state
    (K=32 longs/doc, banded 8×4 — the band store is the only thing the
    ingest job reads), and each incoming batch probes the store with an
    equi-join on (band, band_sig). Cost ∝ batch × collisions, never the
    historical corpus; the store grows by one signature row per accepted
    doc. Complements dedup_incremental_ingest (exact-fp store — catches
    byte-identical copies only) with the near-dup layer: each new doc is
    flagged novel or matched to its best historical near-duplicate.
    est_jaccard = agree/32 is exact in both engines (integer agree count,
    division by a power of two)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "doc_id", "text", n=3).localCheckpoint(
        eager=True)
    hist_bk = D.minhash_band_keys(sig.filter(F.col("doc") < 300))
    new_bk = D.minhash_band_keys(sig.filter(F.col("doc") >= 300))
    cand = (new_bk.alias("x").join(
                hist_bk.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_sig") == F.col("y.band_sig")))
            .select(F.col("x.doc").alias("doc"),
                    F.col("y.doc").alias("hist_doc"))
            .distinct())
    sn = sig.select(F.col("doc"),
                    *[F.col(f"m{i}").alias(f"n{i}")
                      for i in range(D.MINHASH_K)])
    sh = sig.select(F.col("doc").alias("hist_doc"),
                    *[F.col(f"m{i}").alias(f"h{i}")
                      for i in range(D.MINHASH_K)])
    agree = sum(F.when(F.col(f"n{i}") == F.col(f"h{i}"), 1).otherwise(0)
                for i in range(D.MINHASH_K))
    est = (cand.join(sn, "doc").join(sh, "hist_doc")
           .select("doc", "hist_doc",
                   (agree.cast("double") / D.MINHASH_K).alias("est_jaccard"))
           .filter(F.col("est_jaccard") >= 0.5))
    wb = W.partitionBy("doc").orderBy(F.desc("est_jaccard"),
                                      F.asc("hist_doc"))
    best = (est.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") == 1)
            .select("doc", F.col("hist_doc").alias("best_match"),
                    F.col("est_jaccard").alias("best_est")))
    incoming = docs.filter(F.col("doc_id") >= 300).select(
        F.col("doc_id").alias("doc"))
    return (incoming.join(best, "doc", "left")
            .select("doc", F.col("best_match").isNull().alias("novel"),
                    "best_match", "best_est")
            .orderBy("doc"))


_DSIR_BUCKETS = 4096
_DSIR_K = 50
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "pipeline_dsir_importance",
    survey_ref="extensions: data selection via importance resampling "
               "(DSIR-shaped: hashed-bigram LM ratio, integer-quantized)",
    description="Top-50 docs by hashed-bigram importance weight "
                "log2(p_target/p_raw), quantized to integer bit-lengths",
    oracle=f"""
    WITH dw AS (
      SELECT doc_id AS doc, lang, string_split({_NORM}, ' ') AS w
      FROM documents),
    bg AS (
      SELECT doc, lang,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1])) AS b
      FROM dw WHERE len(w) >= 2),
    hb AS (
      SELECT doc, lang,
             {D.sql_md5_long('b')} % {_DSIR_BUCKETS} AS bucket
      FROM bg),
    model AS (
      SELECT bucket,
             CAST(length(bin(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0
                                      END) + 1 AS BIGINT)))
                  - length(bin(CAST(COUNT(*) + 1 AS BIGINT))) AS BIGINT)
               AS weight
      FROM hb GROUP BY bucket),
    scores AS (
      SELECT doc, CAST(SUM(weight) AS BIGINT) AS score
      FROM hb JOIN model USING (bucket)
      GROUP BY doc),
    ranked AS (
      SELECT doc, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS rank
      FROM scores)
    SELECT doc, score, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {_DSIR_K}
    ORDER BY rank
    """,
)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score every raw document by how much more likely its hashed n-gram
    features are under a target-domain LM than under the raw-corpus LM,
    then keep the top of the importance ranking. Here the target is the
    fixture's English subset, features are word bigrams hashed to 4096
    buckets, and the log-ratio is QUANTIZED to integer bit-lengths
    (log2 via length(bin(c+1)) — identical in both engines), which keeps
    the entire selection in exact integer arithmetic: no float log, no
    cross-engine rounding surface. The quantization preserves DSIR's
    structure (hashed features, target/raw ratio, importance ranking)
    while making the judged output bit-deterministic.

    100 TB shape: the model is one 4096-row table built by a map-side-
    combined count and broadcast back; scoring is scan-speed (explode →
    bucket → broadcast equi-join → per-doc integer sum); selection is
    one TakeOrdered. The raw corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    w = X.words(F.col("text"))
    dw = docs.select(F.col("doc_id").alias("doc"), "lang",
                     w.alias("w")).filter(F.size("w") >= 2)
    bigrams = dw.select(
        "doc", "lang",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("w") - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("w"), i + 1),
                                  F.element_at(F.col("w"), i + 2))))
        .alias("b"))
    hb = bigrams.select(
        "doc", "lang",
        (D.md5_long(F.col("b")) % _DSIR_BUCKETS).alias("bucket"))
    blen = lambda c: F.length(F.bin(c.cast("long")))  # noqa: E731
    model = (hb.groupBy("bucket")
             .agg((blen(F.sum(F.when(F.col("lang") == "en", 1)
                              .otherwise(0)) + 1)
                   - blen(F.count(F.lit(1)) + 1))
                  .cast("long").alias("weight")))
    scores = (hb.join(F.broadcast(model), "bucket")
              .groupBy("doc")
              .agg(F.sum("weight").cast("long").alias("score")))
    topk = scores.orderBy(F.desc("score"), F.asc("doc")).limit(_DSIR_K)
    wr = W.orderBy(F.desc("score"), F.asc("doc"))
    return (topk.withColumn("rank", F.row_number().over(wr).cast("int"))
            .orderBy("rank"))


_CAP_PAIRS_SQL = (
    "SELECT doc_a, doc_b FROM ("
    + D.sql_minhash_lsh_pairs("documents", "doc_id", "text", n=3)
    + ") WHERE est_jaccard >= 0.5")
_CAP_MIN_TOKENS = 20


@query(
    "pipeline_curation_corpus",
    survey_ref="extensions: CURATION CAPSTONE — near-dup keep-best → "
               "quality gate → sqrt-temperature quotas → weighted picks, "
               "one judged manifest",
    description="Final corpus manifest: dedup survivors gated on token "
                "count, half-budget apportioned across domains at α=0.5, "
                "docs picked per domain by the E-S weighted key",
    oracle=f"""
    WITH comp AS ({D.sql_dedup_components(
        _CAP_PAIRS_SQL, "documents", "doc_id")}),
    toks AS (
      SELECT doc_id AS doc,
             len(regexp_extract_all({_NORM}, '{X.TOKEN_PATTERN}'))
               AS n_tokens,
             'd' || CAST(CAST(FLOOR(SQRT(CAST(substr(source, 4) AS DOUBLE)))
                              AS INT) AS VARCHAR) AS domain
      FROM documents),
    kept AS (
      SELECT comp.doc, toks.domain, toks.n_tokens
      FROM comp JOIN toks ON comp.doc = toks.doc
      QUALIFY ROW_NUMBER() OVER (PARTITION BY canonical_id
                                 ORDER BY n_tokens DESC, comp.doc) = 1),
    gated AS (
      SELECT doc, domain,
             GREATEST(1, LEAST({C.W_CAP}, n_tokens)) AS weight
      FROM kept WHERE n_tokens >= {_CAP_MIN_TOKENS}),
    gated_counts AS (
      SELECT domain, COUNT(*) AS n_d FROM gated GROUP BY domain),
    {C.sql_temperature_alloc('gated_counts', 'domain', budget_div=2)},
    picked AS (
      SELECT g.doc, g.domain, g.weight, a.alloc,
             ROW_NUMBER() OVER (
               PARTITION BY g.domain
               ORDER BY {C.sql_weighted_sample_key('g.doc', 'g.weight')},
                        g.doc) AS pick_rank
      FROM gated g JOIN ta_alloc a USING (domain))
    SELECT doc, domain, CAST(weight AS BIGINT) AS weight,
           CAST(alloc AS BIGINT) AS alloc,
           CAST(pick_rank AS INTEGER) AS pick_rank
    FROM picked WHERE pick_rank <= alloc
    ORDER BY doc
    """,
)
def pipeline_curation_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation CAPSTONE: every r10 selection primitive composed into
    the manifest a training run would actually consume. Stages — (1) the
    judged near-dup components labeling keeps the token-count argmax per
    cluster (the keep-best policy); (2) survivors gate on a minimum
    token count (the quality floor); (3) a half-corpus budget is
    apportioned across the skewed domains at temperature α=0.5 (integer
    sqrt + Hamilton largest-remainder, quotas clamped to domain size);
    (4) each domain fills its quota in Efraimidis–Spirakis weighted
    order (weight = clipped token count, the min-of-w-md5-draws key), so
    longer documents are proportionally likelier to make the corpus.
    Deterministic end to end — same corpus, same manifest, any cluster —
    and every stage is the exact arithmetic its standalone judged row
    certified (components / keep_best / temperature_mix /
    weighted_bottomk share their builders with this oracle).

    100 TB shape: the labeling is the sf10-proven distributed components
    pass; everything after is one hash projection, a |domains|-row
    broadcast quota table, and per-domain TakeOrdered picks — no stage
    shuffles the corpus beyond the dedup evidence."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (D.minhash_lsh_pairs(docs, "doc_id", "text", n=3)
             .filter(F.col("est_jaccard") >= 0.5)
             .select("doc_a", "doc_b"))
    comp = D.dedup_components(pairs, docs.select("doc_id"))
    toks = docs.select(
        F.col("doc_id").alias("doc"),
        X.token_count(F.col("text")).alias("n_tokens"),
        F.concat(F.lit("d"),
                 F.floor(F.sqrt(F.expr(
                     "CAST(substring(source, 4) AS DOUBLE)")))
                  .cast("int").cast("string")).alias("domain"))
    wk = W.partitionBy("canonical_id").orderBy(F.desc("n_tokens"),
                                               F.asc("doc"))
    kept = (comp.join(toks, "doc")
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1))
    gated = (kept.filter(F.col("n_tokens") >= _CAP_MIN_TOKENS)
             .select("doc", "domain",
                     F.greatest(F.lit(1),
                                F.least(F.lit(C.W_CAP), F.col("n_tokens")))
                      .cast("long").alias("weight")))
    counts = gated.groupBy("domain").agg(F.count(F.lit(1)).alias("n_d"))
    alloc = C.temperature_alloc(counts, "domain", budget_div=2)
    wp = W.partitionBy("domain").orderBy(
        C.weighted_sample_key(F.col("doc"), F.col("weight")), F.asc("doc"))
    return (gated.join(F.broadcast(alloc), "domain")
            .withColumn("pick_rank", F.row_number().over(wp).cast("int"))
            .filter(F.col("pick_rank") <= F.col("alloc"))
            .select("doc", "domain", "weight",
                    F.col("alloc").cast("long").alias("alloc"), "pick_rank")
            .orderBy("doc"))


@query(
    "txnlog_time_travel_stats",
    survey_ref="extensions: TIME TRAVEL on the transactional commit-log "
               "table (read AS OF an earlier version)",
    description="Event stats read AS OF version 2 of a 3-commit table: "
                "the pinned snapshot excludes the third commit and "
                "survives a later compaction",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE event_id % 3 IN (0, 1)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def txnlog_time_travel_stats(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TIME TRAVEL — the lakehouse read every reproducibility story
    depends on ('train on the corpus exactly as it was at version N'):
    the events table lands as THREE commits (event_id % 3 slices), then
    COMPACTS (the snapshot rewrite that obsoletes the per-commit dirs),
    and the judged read pins ``version=2`` — the pre-compaction,
    pre-third-commit state. The value hash certifies both halves of the
    contract: the pinned snapshot contains exactly commits 1–2 (the
    oracle recomputes that slice from the raw fixture), and a LATER
    compaction cannot leak into or corrupt an earlier version's view
    (sources/txnlog.py keeps superseded entries addressable until
    vacuum; the version-pinned read path is read(version=...) at
    txnlog.py:410, locally tested since r6 — this row gives it a
    driver-judged certificate).

    100 TB shape: version resolution is a log-manifest walk (KBs);
    the pinned read plans exactly the files of commits ≤ N — no data
    copied per version, storage cost ∝ deltas, identical to the
    snapshot-isolation design of production table formats."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from fictional_guacamole_spark.sources import txnlog as _txnmod
    from fictional_guacamole_spark.sources.txnlog import (
        TransactionalParquetTable)

    events = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    # cache tag folds the writer-format version: a txnlog layout change
    # invalidates stale on-disk tables automatically (r10 advice)
    tag = hashlib.md5(
        f"timetravel1:fmt{_txnmod.FORMAT_VERSION}:{src}:"
        f"{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_tt_{tag}")
    if not os.path.exists(base):
        # private build, atomic publish; uuid (not just pid) so two
        # concurrent builders in one process cannot share a build dir
        build = f"{base}.build.{uuid.uuid4().hex}"
        t = TransactionalParquetTable(build)
        for i in range(3):
            t.commit(events.filter(F.col("event_id") % 3 == i),
                     f"slice-{i}")
        t.compact(spark, "optimize-1")  # must NOT disturb pinned reads
        try:
            os.rename(build, base)
        except OSError:  # concurrent builder published first; ours is moot
            shutil.rmtree(build, ignore_errors=True)
    pinned = TransactionalParquetTable(base).read(spark, version=2)
    return (pinned.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100)).cast("long")
                  .alias("value_cents"))
            .orderBy("event_type"))


# -- the dedup CASCADE (r10 verdict task #2) ---------------------------------
# SCALE.md's production prescription for the dup-saturated corpus, as one
# judged pipeline: EXACT dedup first (byte-identical copies die on an
# md5-fingerprint groupBy), MinHash near-dup components over the exact
# survivors, and the expensive semantic verify runs ONLY on the near-dup
# survivors — the stage ordering that retired the r10 sf10 wall (naive
# semantic verify on the full 500 K-doc replica corpus OOM'd; the cascade
# hands it the collapsed cluster representatives instead).
_CASC_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_CASC_MH_PAIRS = ("SELECT doc_a, doc_b FROM ("
                  + D.sql_minhash_lsh_pairs(
                      "casc_s1_docs", "doc_id", "text", n=3)
                  + ") _casc_mh_est WHERE est_jaccard >= 0.5")
# Stage 3 blocks on 1-GRAM (bag-of-words) minhash bands — order-
# insensitive, so it surfaces the reordered/bag-similar pairs whose
# 3-gram Jaccard is low (measured: 48 of the 50 cos ≥ 0.9 pairs the
# 3-gram stage misses at sf0.01 band-collide under 1-gram, and ZERO of
# them under 3-gram bands at any τ). 1-gram blocking is weakly selective
# on a shared vocabulary, which is exactly why it belongs in a cascade:
# it only ever sees the collapsed survivor set.
_CASC_SEM_PAIRS = C.sql_semantic_pairs("casc_s2_docs", "doc_id", "text",
                                       tau_num=9, tau_den=10, shingle_n=1)


@query(
    "pipeline_dedup_cascade",
    survey_ref="extensions: DEDUP CASCADE (exact → MinHash components → "
               "semantic verify on survivors only — the staged production "
               "plan for dup-saturated corpora)",
    description="Every doc's fate through the three-stage cascade: stage "
                "that eliminated it (exact/near_dup/semantic/kept) and its "
                "stage-local representative",
    oracle=f"""
    WITH RECURSIVE casc_fp AS MATERIALIZED (
      SELECT doc_id AS doc, md5({_CASC_NORM}) AS fp FROM documents),
    casc_rep1 AS MATERIALIZED (
      SELECT doc, fp, MIN(doc) OVER (PARTITION BY fp) AS exact_rep
      FROM casc_fp),
    casc_s1 AS MATERIALIZED (
      SELECT doc FROM casc_rep1 WHERE doc = exact_rep),
    casc_s1_docs AS MATERIALIZED (
      SELECT d.* FROM documents d JOIN casc_s1 s ON d.doc_id = s.doc),
    casc_mh_pairs AS MATERIALIZED ({_CASC_MH_PAIRS}),
    {D.sql_components_ctes('casc_mh', 'casc_mh_pairs', 'casc_s1', 'doc')},
    casc_s2 AS MATERIALIZED (
      SELECT doc FROM casc_mh_comp WHERE doc = canonical_id),
    casc_s2_docs AS MATERIALIZED (
      SELECT d.* FROM documents d JOIN casc_s2 s ON d.doc_id = s.doc),
    casc_sem_pairs AS MATERIALIZED ({_CASC_SEM_PAIRS}),
    {D.sql_components_ctes('casc_sem', 'casc_sem_pairs', 'casc_s2', 'doc')}
    SELECT r.doc,
           CASE WHEN r.doc <> r.exact_rep THEN 'exact'
                WHEN mh.canonical_id <> r.doc THEN 'near_dup'
                WHEN sem.canonical_id <> r.doc THEN 'semantic'
                ELSE 'kept' END AS stage,
           CASE WHEN r.doc <> r.exact_rep THEN r.exact_rep
                WHEN mh.canonical_id <> r.doc THEN mh.canonical_id
                WHEN sem.canonical_id <> r.doc THEN sem.canonical_id
                ELSE r.doc END AS rep
    FROM casc_rep1 r
    LEFT JOIN casc_mh_comp mh ON r.doc = mh.doc
    LEFT JOIN casc_sem_comp sem ON r.doc = sem.doc
    ORDER BY r.doc
    """,
)
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged dedup CASCADE — cheap-first elimination, each stage
    feeding only its survivors forward: (1) EXACT dedup (md5 fingerprint
    groupBy, 32-byte keys — byte-identical copies die at scan speed);
    (2) MinHash-LSH near-dup components over exact survivors (banded
    equi-joins + the sf10-proven distributed labeling, est_jaccard ≥
    0.5); (3) SEMANTIC verify over ONLY the near-dup survivors — the
    judged dedup_semantic_embedding machinery re-aimed at what stage 2
    CANNOT see: candidates block on 1-GRAM (bag-of-words) minhash
    bands, order-insensitive, and verify on exact-integer hashed-TF
    cosine ≥ 0.9. Measured at sf0.01: 50 pairs clear cos ≥ 0.9 but
    escape the 3-gram est ≥ 0.5 stage (reordered/bag-similar docs), 48
    of them band-collide under 1-gram, and ZERO under 3-gram bands at
    any τ — each stage catches a failure mode the previous one is blind
    to. Output: one row per original doc with the stage
    that eliminated it ('exact' | 'near_dup' | 'semantic' | 'kept') and
    its STAGE-LOCAL representative (the doc that beat it at that stage;
    kept docs represent themselves).

    This row codifies the r10 SCALE.md prescription with judged code:
    the naive single-stage semantic verify hit a real 128 GB wall on the
    dup-saturated sf10 replica corpus (~134 M candidate pairs × sparse
    dims); the cascade hands the semantic stage only collapsed cluster
    representatives, so its verify join is priced by DISTINCT content
    volume, not corpus volume. sf10 value-judged in SCALE.md (r11).

    100 TB shape: stage 1 is one tiny-key shuffle; stage 2 is banded
    equi-joins + components; stage 3's blocking/verify/labeling run on
    the reduced survivor set — every stage's cost is ∝ its input's
    distinct-content size, the defining property of a cascade."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        F.col("doc_id").alias("doc"),
        F.md5(X.normalize(F.col("text"))).alias("fp"))
    wfp = W.partitionBy("fp")
    rep1 = fp.withColumn("exact_rep", F.min("doc").over(wfp))
    s1 = (rep1.filter(F.col("doc") == F.col("exact_rep"))
          .select("doc").localCheckpoint(eager=True))
    # repartition BEFORE the expensive shingle/minhash/TF maps: the
    # survivor join broadcasts (s1 keys are tiny), so without this the
    # heavy maps inherit the RAW SCAN's partitioning — measured at sf10:
    # documents.parquet lands as 3 input splits, so shingling 500 K docs
    # ran 3-way parallel on a 32-core host (a >10-minute straggler
    # stage). One cheap shuffle of the text restores full parallelism;
    # at 100 TB this is the standard re-split between a pruned scan and
    # a CPU-bound map stage. The COUNT is pinned to the cluster's core
    # count (r15, guide §2.6): left implicit, AQE's byte-based
    # coalescing folded the tiny-bytes survivor text to ONE partition
    # at sf0.1, single-threading the CPU-bound shingle stage the bytes
    # estimate cannot price.
    s1_docs = (docs.join(s1.select(F.col("doc").alias("doc_id")), "doc_id")
               .repartition(spark.sparkContext.defaultParallelism,
                            F.col("doc_id")))
    # ONE tokenize subtree for stages 2 AND 3 (r16, guide §2.4/§6): the
    # survivor text is normalized + split ONCE into a cached (doc, words)
    # frame; stage 2 derives its 3-gram minhash shingles from it, and
    # stage 3 — whose input s2 ⊆ s1 — derives BOTH its 1-gram blocking
    # shingles and its hashed-TF vectors from the same cache via a
    # survivor-keys join (tokenization is per-row, so filtering the token
    # frame ≡ tokenizing the filtered docs). The cache fills as a side
    # effect of stage 2's own components checkpoint, so no extra pass
    # materializes it; the old shape ran scan → survivor-join →
    # normalize → split THREE times (mh shingles, sem shingles, sem TF).
    s1_w = D.words_frame(s1_docs, "doc_id", "text").cache()
    mh_pairs = (D.minhash_lsh_pairs_from_words(s1_w, n=3)
                .filter(F.col("est_jaccard") >= 0.5)
                .select("doc_a", "doc_b"))
    mh_comp = D.dedup_components(mh_pairs, s1).localCheckpoint(eager=True)
    s2 = (mh_comp.filter(F.col("doc") == F.col("canonical_id"))
          .select("doc"))
    s2_w = s1_w.join(s2, "doc")
    sem_pairs = C.semantic_pairs_from_words(s2_w,
                                            tau_num=9, tau_den=10,
                                            shingle_n=1)
    sem_comp = D.dedup_components(sem_pairs, s2)
    mh = mh_comp.select("doc", F.col("canonical_id").alias("mh_canon"))
    sem = sem_comp.select("doc", F.col("canonical_id").alias("sem_canon"))
    out = (rep1.select("doc", "exact_rep")
           .join(mh, "doc", "left").join(sem, "doc", "left"))
    stage = (F.when(F.col("doc") != F.col("exact_rep"), F.lit("exact"))
             .when(F.col("mh_canon") != F.col("doc"), F.lit("near_dup"))
             .when(F.col("sem_canon") != F.col("doc"), F.lit("semantic"))
             .otherwise(F.lit("kept")))
    rep = (F.when(F.col("doc") != F.col("exact_rep"), F.col("exact_rep"))
           .when(F.col("mh_canon") != F.col("doc"), F.col("mh_canon"))
           .when(F.col("sem_canon") != F.col("doc"), F.col("sem_canon"))
           .otherwise(F.col("doc")))
    return (out.select("doc", stage.alias("stage"), rep.alias("rep"))
            .orderBy("doc"))


@query(
    "txnlog_schema_evolution_stats",
    survey_ref="K3 schema migration: SCHEMA EVOLUTION on the commit-log "
               "table (widened schema readable across the boundary, old "
               "rows null-filled; time travel pins the OLD schema)",
    description="Head read of a table whose second commit ADDED a column: "
                "pre-evolution rows null-filled, per-status stats, plus "
                "the time-traveled v1 column list proving the old schema "
                "is pinned",
    oracle="""
    WITH head AS (
      SELECT o_orderkey AS okey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(NULL AS VARCHAR) AS status
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT),
             o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1)
    SELECT status, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           'cents,okey' AS v1_cols
    FROM head GROUP BY status
    ORDER BY status
    """,
)
def txnlog_schema_evolution_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION (K3) — the most-hit lakehouse feature after plain
    reads: commit 1 lands orders slice %2==0 under schema A = (okey,
    cents); commit 2 lands slice %2==1 under the WIDENED schema
    A′ = (okey, cents, status). The judged head read must union by name
    with the missing column null-filled (sources/txnlog.py read path),
    so pre-evolution rows group under NULL status — which the oracle
    reconstructs verbatim from the raw fixture. The row also certifies
    the OTHER half of the evolution contract: a time travel to version 1
    must present the PRE-evolution schema (no ``status`` column at all,
    not a null-filled one) — the pinned v1 column list rides along as
    the ``v1_cols`` literal the oracle states expected ('cents,okey').
    The reference migrates its SQLite schema in place (real_guac.py's
    CREATE TABLE IF NOT EXISTS bootstrap); the commit-log form keeps
    every historical schema addressable instead.

    100 TB shape: evolution costs ZERO data rewrite — the log records
    each commit's schema (KB-scale JSON) and reads union by name;
    time-traveled schemas resolve from the version-pinned entry list
    (txnlog.py:430), never from the log head."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from fictional_guacamole_spark.sources import txnlog as _txnmod
    from fictional_guacamole_spark.sources.txnlog import (
        TransactionalParquetTable)

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("status"))
    src = os.path.join(sf_dir, "orders.parquet")
    tag = hashlib.md5(
        f"schemaevo1:fmt{_txnmod.FORMAT_VERSION}:{src}:"
        f"{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_sevo_{tag}")
    if not os.path.exists(base):
        build = f"{base}.build.{uuid.uuid4().hex}"
        t = TransactionalParquetTable(build)
        t.commit(rows.filter(F.col("okey") % 2 == 0).select("okey", "cents"),
                 "schema-a")
        t.commit(rows.filter(F.col("okey") % 2 == 1), "schema-a-prime")
        try:
            os.rename(build, base)
        except OSError:  # concurrent builder published first; ours is moot
            shutil.rmtree(build, ignore_errors=True)
    table = TransactionalParquetTable(base)
    v1_cols = ",".join(sorted(table.read(spark, version=1).columns))
    head = table.read(spark)
    return (head.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("long").alias("cents_sum"))
            .withColumn("v1_cols", F.lit(v1_cols))
            .orderBy("status"))


@query(
    "delta_log_read_stats",
    survey_ref="Lakehouse INTEROP (r13 verdict task #5): the PUBLIC Delta "
               "Lake _delta_log protocol read from the spec — JSON "
               "add/remove replay, a parquet checkpoint load-bearing "
               "after log cleanup, post-checkpoint remove, schema "
               "evolution via metaData, and time travel",
    description="A spec-conformant Delta log over deterministic orders "
                "slices: head read (3 surviving files, pre-evolution rows "
                "null-filled) and a version-pinned read answered from the "
                "checkpoint alone (its JSON commits are deleted); "
                "per-snapshot row/sum/nonnull/file-count stats",
    oracle="""
    WITH r AS (
      SELECT o_orderkey AS okey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus AS status,
             o_orderkey % 5 AS b
      FROM orders)
    SELECT 'head' AS snap, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(SUM(CASE WHEN b = 4 AND status IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS status_nonnull,
           3 AS n_files, 'cents,okey,status' AS cols
    FROM r WHERE b IN (0, 2, 4)
    UNION ALL
    SELECT 'v2', COUNT(*), CAST(SUM(cents) AS BIGINT),
           CAST(NULL AS BIGINT), 3, 'cents,okey'
    FROM r WHERE b IN (0, 2, 3)
    ORDER BY snap
    """,
)
def delta_log_read_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last interchange surface a real lakehouse user hits (r13
    verdict task #5): reading a table in the OPEN Delta Lake format —
    plain parquet + a ``_delta_log`` of JSON actions and parquet
    checkpoints (sources/delta_log.py implements the read side from the
    public spec, no library). Every protocol feature in the fixture is
    load-bearing for the judged values:

    - okey%5 buckets 0..4 land as files A,B,C,E under schema (okey,
      cents) and D under the WIDENED schema (+status);
    - v0 adds A,B; v1 adds C and REMOVES B; v2 adds E, then a parquet
      CHECKPOINT is written at v2 and commits 0-2 are DELETED (spec log
      cleanup) — so the v2 time-travel read below is answerable ONLY
      from the checkpoint;
    - v3 widens the schema via metaData, adds D, and removes E — a
      post-checkpoint JSON remove that must tombstone a
      checkpoint-sourced add.

    Head read → files A,C,D with D's schema (A,C rows null-filled in
    ``status``); version=2 read → files A,C,E under the pre-evolution
    schema (no status column at all — its stat reads NULL). A wrong
    replay shifts n_rows/cents_sum; a checkpoint bypass raises; a missed
    remove inflates head by E's bucket; a broken null-fill changes
    status_nonnull.

    100 TB shape: the log replay is KB-scale metadata by the spec's own
    checkpoint design; the checkpoint parquet is read through Spark with
    only the file MANIFEST collected (the repo's bounded-collect class);
    the data read is an ordinary distributed parquet scan with explicit
    schema, so pruning/pushdown apply untouched."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from fictional_guacamole_spark.sources import delta_log as _dlmod
    from fictional_guacamole_spark.sources.delta_log import (
        DeltaLogWriter, read_delta, snapshot_info)

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_orderkey") % 5).alias("b"))
    s1 = StructType([StructField("okey", LongType()),
                     StructField("cents", LongType())])
    s2 = StructType([StructField("okey", LongType()),
                     StructField("cents", LongType()),
                     StructField("status", StringType())])

    src = os.path.join(sf_dir, "orders.parquet")
    tag = hashlib.md5(
        f"deltalog1:max{_dlmod.MAX_READER_VERSION}:{src}:"
        f"{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_deltalog_{tag}")
    if not os.path.exists(base):
        build = f"{base}.build.{uuid.uuid4().hex}"
        w = DeltaLogWriter(build)

        def _slice(bucket: int, schema: StructType):
            return (rows.filter(F.col("b") == bucket)
                    .select(*[f.name for f in schema.fields]))

        fa = w.write_data_file(_slice(0, s1), "a.parquet")
        fb = w.write_data_file(_slice(1, s1), "b.parquet")
        fc = w.write_data_file(_slice(2, s1), "c.parquet")
        fe = w.write_data_file(_slice(3, s1), "e.parquet")
        fd = w.write_data_file(_slice(4, s2), "d.parquet")
        w.commit([w.protocol_action(), w.metadata_action(s1),
                  w.add_action(fa), w.add_action(fb)])
        w.commit([w.add_action(fc), w.remove_action("b.parquet")])
        w.commit([w.add_action(fe)])
        w.checkpoint(spark)
        w.clean_log_before(3)   # the v2 read now NEEDS the checkpoint
        w.commit([w.metadata_action(s2), w.add_action(fd),
                  w.remove_action("e.parquet")])
        try:
            os.rename(build, base)
        except OSError:  # concurrent builder published first; ours is moot
            shutil.rmtree(build, ignore_errors=True)

    def _stats(label: str, version: int | None) -> DataFrame:
        df = read_delta(spark, base, version=version)
        info = snapshot_info(spark, base, version=version)
        status_stat = (F.count("status").cast("long")
                       if "status" in df.columns
                       else F.lit(None).cast("long"))
        return (df.agg(F.count(F.lit(1)).alias("n_rows"),
                       F.sum("cents").cast("long").alias("cents_sum"),
                       status_stat.alias("status_nonnull"))
                .select(F.lit(label).alias("snap"), "n_rows", "cents_sum",
                        "status_nonnull",
                        F.lit(info["n_files"]).cast("int").alias("n_files"),
                        F.lit(",".join(sorted(info["columns"])))
                        .alias("cols")))

    return _stats("head", None).unionByName(
        _stats("v2", 2)).orderBy("snap")


def _cdc_orders_feed_table(spark: SparkSession, sf_dir: str) -> str:
    """The shared 3-commit keyed table both change-feed rows read:
    orders slice %3==0 upserted as v1 (seed), %3==1 as v2, keys %12==0
    deleted as v3 (key-only tombstones). Built once per fixture under
    /tmp (md5-tagged by source mtime + both writer-format versions),
    uuid-suffixed private build dir, atomic rename publish."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from fictional_guacamole_spark.sources import cdc as _cdcmod
    from fictional_guacamole_spark.sources import txnlog as _txnmod
    from fictional_guacamole_spark.sources.cdc import UpsertTable

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("status"))
    src = os.path.join(sf_dir, "orders.parquet")
    # both layer versions in the tag: txnlog layout + CDC op-tag shape
    tag = hashlib.md5(
        f"cdcfeed1:fmt{_txnmod.FORMAT_VERSION}.{_cdcmod.FORMAT_VERSION}:"
        f"{src}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_cdcfeed_{tag}")
    if not os.path.exists(base):
        # private build, atomic publish; uuid (not just pid) so two
        # concurrent builders in one process cannot share a build dir
        build = f"{base}.build.{uuid.uuid4().hex}"
        t = UpsertTable(build, keys=["okey"])
        t.upsert(rows.filter(F.col("okey") % 3 == 0), "seed")
        t.upsert(rows.filter(F.col("okey") % 3 == 1), "wave-2")
        t.delete_keys(rows.filter(F.col("okey") % 12 == 0)
                      .select("okey"), "purge")
        try:
            os.rename(build, base)
        except OSError:  # concurrent builder published first; ours is moot
            shutil.rmtree(build, ignore_errors=True)
    return base


@query(
    "stream_engine_change_feed_apply",
    survey_ref="§2.5 streaming + lakehouse: the change feed consumed as a "
               "STREAM (file-stream over post-version delta dirs → "
               "foreachBatch replica apply, exactly-once under a replayed "
               "batch, latest-wins by SOURCE version)",
    description="A replica built by STREAMING the orders table's change "
                "feed since v1 onto its v1 snapshot: the engine drains "
                "only the delta dirs, batch 1 is deliberately replayed, "
                "and the resolved replica equals the source head",
    oracle="""
    SELECT o_orderkey AS okey,
           o_custkey AS cust,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderstatus AS status
    FROM orders
    WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 12 <> 0
    ORDER BY okey
    """,
)
def stream_engine_change_feed_apply(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The change feed consumed THROUGH the real Structured Streaming
    engine — the r10 verdict's task #4, completing the CDF story: batch
    reads proved feed-apply semantics (the a179f63 contract test and
    cdc_change_feed_orders); this row runs the consumer as a stream. A
    file-stream source reads ONLY the post-v1 delta directories (the
    path is a glob alternation over exactly those dirs, resolved from
    the commit log — compaction bases and the v1 seed are unreachable by
    construction), one file per trigger so the drain is genuinely
    multi-micro-batch; every micro-batch lands VERBATIM (rows + _op +
    source version from the file path) into a replica commit log via
    foreachBatch with batch-id txn ids, and batch 1 is committed TWICE
    on purpose — the replayed-batch convergence check every judged sink
    row carries. The replica's resolved state is latest-wins by SOURCE
    commit version over (v1 snapshot ∪ accumulated feed), which makes
    the apply independent of file-arrival order — the property a real
    CDF consumer needs because object-store listing order is not commit
    order. The judged output is the resolved replica, which must equal
    the source head snapshot reconstructed by the oracle from the raw
    fixture (upserted slices minus deleted keys).

    100 TB shape: consumer cost ∝ changes (the engine lists and scans
    only delta dirs; the file-source offset log replaces Kafka offsets);
    the replica append is delta-proportional; resolution is one window
    per key over base + deltas, amortized by compaction cadence."""
    import os
    import shutil
    import tempfile

    from fictional_guacamole_spark.sources.cdc import UpsertTable
    from fictional_guacamole_spark.sources.txnlog import (
        TransactionalParquetTable)
    from pyspark.sql import Window
    from pyspark.sql import types as T

    base = _cdc_orders_feed_table(spark, sf_dir)
    src_table = UpsertTable(base, keys=["okey"])
    feed_entries = [e for e in src_table.history()
                    if "base_through" not in e and e["version"] > 1]
    dir_to_ver = {os.path.basename(e["data_dir"]): e["version"]
                  for e in feed_entries}
    glob = "{" + ",".join(sorted(dir_to_ver)) + "}"
    schema = T.StructType([
        T.StructField("okey", T.LongType()),
        T.StructField("cust", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("_op", T.StringType()),
    ])
    ver_expr = F.element_at(
        F.create_map(*[x for d, v in sorted(dir_to_ver.items())
                       for x in (F.lit(d), F.lit(v))]),
        F.element_at(F.split(
            F.regexp_replace(F.input_file_name(), "/[^/]*$", ""), "/"), -1))

    root = tempfile.mkdtemp(prefix="fg_cdcstream_")
    replica = TransactionalParquetTable(os.path.join(root, "replica"))
    ckpt = os.path.join(root, "ckpt")

    def land(batch_df, batch_id):
        replica.commit(batch_df, f"feed-apply-{batch_id}")
        if batch_id == 1:
            # simulated sink-failure retry: same batch, same txn id —
            # the commit log must converge, not double-apply
            replica.commit(batch_df, f"feed-apply-{batch_id}")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(base, "data", glob))
              .withColumn("_src_ver", ver_expr))
    q = (stream.writeStream.foreachBatch(land)
         .option("checkpointLocation", ckpt)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # exactly-once evidence beyond the value hash: the replayed commit
    # must have converged into the original (one log entry per batch)
    txns = [e["txn_id"] for e in replica.history()]
    assert len(txns) == len(set(txns)), "replayed batch double-landed"

    v1 = (src_table.read(spark, version=1)
          .withColumn("_op", F.lit("u"))
          .withColumn("_src_ver", F.lit(1).cast("long")))
    applied = replica.read(spark).select(
        "okey", "cust", "cents", "status", "_op",
        F.col("_src_ver").cast("long").alias("_src_ver"))
    merged = v1.select(*applied.columns).unionByName(applied)
    w = Window.partitionBy("okey").orderBy(F.desc("_src_ver"))
    out = (merged.withColumn("_rn", F.row_number().over(w))
           .filter((F.col("_rn") == 1) & (F.col("_op") != "d"))
           .select("okey", "cust", "cents", "status")
           .orderBy("okey")
           .localCheckpoint(eager=True))
    shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "cdc_change_feed_orders",
    survey_ref="extensions: CHANGE DATA FEED read (row-level deltas since "
               "a version — upserts with values, deletes as tombstones)",
    description="The change feed of a 3-commit keyed table since version "
                "1: commit-2 upserts with values, commit-3 delete "
                "tombstones with null-filled non-keys",
    oracle="""
    SELECT o_orderkey AS okey,
           o_custkey AS cust,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderstatus AS status,
           'u' AS _op, CAST(2 AS INT) AS _commit_version
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT o_orderkey, NULL, NULL, NULL, 'd', 3
    FROM orders WHERE o_orderkey % 12 = 0
    ORDER BY _commit_version, okey
    """,
)
def cdc_change_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED — the read that turns the keyed lakehouse table
    into a replication source (Delta's table_changes / CDF): downstream
    consumers (a derived MV, a search index, a replica) apply exactly
    the row-level deltas committed after the version they last saw,
    never re-diffing snapshots. The judged cycle: orders slice %3==0
    upserted as v1, slice %3==1 as v2, keys %12==0 deleted as v3
    (key-only tombstones — a delete ships its keys, not its rows);
    ``changes(since_version=1)`` must return exactly the v2 upserts
    (with values) and the v3 tombstones (non-key columns null-filled by
    the log's schema union), each tagged with _op and _commit_version —
    which the oracle reconstructs verbatim from the raw fixture.
    Completes the lakehouse read triad: snapshot (merge-on-read),
    time travel (version pin), and now the feed between versions.

    100 TB shape: the feed reads ONLY the delta dirs after
    since_version (manifest walk + targeted scans) — cost ∝ changes,
    never table size; compaction bases never appear in the feed, so
    OPTIMIZE between polls is invisible to consumers."""
    from fictional_guacamole_spark.sources.cdc import UpsertTable

    base = _cdc_orders_feed_table(spark, sf_dir)
    feed = UpsertTable(base, keys=["okey"]).changes(spark, since_version=1)
    return (feed.select("okey", "cust", "cents", "status", "_op",
                        F.col("_commit_version").cast("int")
                        .alias("_commit_version"))
            .orderBy("_commit_version", "okey"))

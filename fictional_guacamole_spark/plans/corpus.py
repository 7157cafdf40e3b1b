"""Corpus-scale curation queries, round-11 second wave: exact-substring
dedup (Lee et al. 2022 ExactSubstr re-expressed as fingerprint grouping),
a MinHash-LSH blocking recall/precision audit (the dedup analogue of
``sim_recall_audit``), UniMax epoch-capped mixing (Chung et al. 2023),
WebDataset-style tar-shard interchange, and fully-distributed Lloyd
k-means over the real embedding vectors — each with a full DuckDB value
oracle on the driver's fixture tables.

Reference parity note: the reference app (real_guac.py / polo_ws.py) is a
websocket→SQLite market-data ETL with no corpus tooling; these operators
are the LLM-training-data surface the build brief adds on top, designed
Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import curation as C
from fictional_guacamole_spark.functions import dedup as D
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table


# ---------------------------------------------------------------------------
# ExactSubstr: cross-document duplicated spans
# ---------------------------------------------------------------------------

@query(
    "dedup_exact_substring",
    survey_ref="extensions: exact-substring dedup (ExactSubstr, Lee et al. "
               "2022) — cross-doc repeated spans via positional k-gram "
               "fingerprints + gaps-and-islands merge",
    description="Per-doc summary of word spans duplicated verbatim across "
                "documents: span count, removable word count, longest span",
    oracle=D.sql_exact_substring_summary("documents", "doc_id", "text"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr (suffix-array dedup) done Spark-first: hash every word
    6-gram WITH its position, one groupBy on the 60-bit hash finds grams
    in ≥ 2 distinct docs (min(doc) <> max(doc) — constant state, full
    map-side partial agg), one equi-join tags matched positions, one
    per-doc window merges them into maximal spans. ``dup_words`` is
    exactly what span removal would cut. The global suffix sort the
    single-node tool needs never happens — at 100 TB every stage stays
    a hash-partitioned groupBy/join."""
    docs = load_table(spark, sf_dir, "documents")
    return (D.exact_substring_summary(docs, "doc_id", "text")
            .orderBy("doc"))


# ---------------------------------------------------------------------------
# Blocking-recall audit: does MinHash-LSH catch the true near-dup pairs?
# ---------------------------------------------------------------------------

_AUDIT_BUCKET = ("CASE WHEN jaccard >= 0.9 THEN 'j90_100' "
                 "WHEN jaccard >= 0.7 THEN 'j70_90' "
                 "ELSE 'j50_70' END")

# deterministic doc sample for the scale-safe audit protocol: bottom-K of
# md5(doc_id) — a uniform pseudo-random subset both engines select
# identically at any SF, over which the quadratic exact truth is O(K²)
# FLAT regardless of corpus size
_AUDIT_SAMPLE_K = 250
_SQL_AUDIT_SAMPLE = (
    "SELECT doc_id, text FROM documents "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
    f"LIMIT {_AUDIT_SAMPLE_K}")


def _sql_blocking_recall(table: str, prelude: str = "") -> str:
    """DuckDB rendering of the blocking audit over ``table`` (optionally
    preceded by extra CTEs in ``prelude`` — the sampled protocol injects
    its deterministic sample here)."""
    return f"""
    WITH {prelude}truth AS (
      SELECT doc_a, doc_b, jaccard,
             {_AUDIT_BUCKET} AS bucket
      FROM ({D.sql_ngram_jaccard_pairs(table, "doc_id", "text",
                                       3, 0.5)}) tj),
    cand AS (
      SELECT doc_a, doc_b
      FROM ({D.sql_minhash_lsh_pairs(table, "doc_id", "text", 3)}) cj),
    hits AS (
      SELECT t.bucket, t.doc_a, t.doc_b,
             CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM truth t LEFT JOIN cand c
        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
    by_bucket AS (
      SELECT bucket, COUNT(*) AS n_pairs, SUM(hit) AS n_caught
      FROM hits GROUP BY bucket),
    all_true AS (
      SELECT 'all_true' AS bucket, COUNT(*) AS n_pairs, SUM(hit) AS n_caught
      FROM hits),
    precision AS (
      SELECT 'candidates' AS bucket, COUNT(*) AS n_pairs,
             SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS n_caught
      FROM cand c LEFT JOIN truth t
        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
    unioned AS (
      SELECT * FROM by_bucket UNION ALL
      SELECT * FROM all_true UNION ALL
      SELECT * FROM precision)
    SELECT bucket, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_caught AS BIGINT) AS n_caught,
           CAST(CASE WHEN n_pairs > 0
                THEN (10000 * n_caught) // n_pairs ELSE 0 END AS BIGINT)
             AS rate_bp
    FROM unioned
    ORDER BY bucket
    """


@query(
    "dedup_recall_audit",
    survey_ref="extensions: LSH blocking recall/precision audit vs exact "
               "n-gram Jaccard ground truth (the dedup analogue of "
               "sim_recall_audit)",
    description="Recall of MinHash-LSH candidate pairs against exact "
                "3-gram-Jaccard ground truth, by similarity bucket, plus "
                "candidate precision",
    oracle=_sql_blocking_recall("documents"),
)
def dedup_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certifies the MinHash-LSH blocking stage the way sim_recall_audit
    certifies the ANN indexes: exact 3-gram-Jaccard pairs (threshold 0.5)
    are the ground truth; the banded candidates either catch them or
    don't. Rows: recall per Jaccard bucket (banding theory says recall
    rises steeply with similarity — 8 bands x 4 rows crosses 50 % at
    J ~ 0.59), an all-true summary row, and a 'candidates' row whose
    rate is the PRECISION of the blocking stage. rate_bp is integer
    basis points (DIV), bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    return _blocking_recall_frame(docs)


@query(
    "dedup_recall_audit_sampled",
    survey_ref="extensions: the SCALE-SAFE blocking audit protocol — "
               "deterministic md5 bottom-K doc sample, exact Jaccard "
               "truth on the sample only (O(K²) flat at any SF)",
    description="The LSH blocking recall/precision audit run on a "
                "deterministic 250-doc md5 sample: the production "
                "protocol whose exact-truth cost is constant in corpus "
                "size",
    oracle=_sql_blocking_recall(
        "sample_docs", prelude=f"sample_docs AS ({_SQL_AUDIT_SAMPLE}),\n"),
)
def dedup_recall_audit_sampled(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The sampled audit protocol, now the REGISTERED row (r11 verdict
    task #3 — the exhaustive form above is quadratic in replica
    multiplicity by construction and exceeded the sf10 budget;
    SCALE.md's 'run it on a sampled slice at production scale' is here
    made executable and judged). Sample = bottom-``_AUDIT_SAMPLE_K``
    docs by md5(doc_id) — deterministic, uniform, engine-agnostic; the
    exact 3-gram-Jaccard ground truth runs over sample pairs only, so
    its cost is O(K²) FLAT regardless of corpus size, while sample
    selection is one top-K pass. Band collisions depend only on the two
    docs' own signatures, so sample-restricted candidates equal the
    full-corpus blocking stage restricted to sample pairs — the recall
    measured here IS the production blocking recall, estimated on K
    docs. At the judged SF the oracle runs the identical sampled
    protocol, so the two engines coincide on the full sample."""
    docs = load_table(spark, sf_dir, "documents")
    sample = (docs.select("doc_id", "text")
              .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
              .limit(_AUDIT_SAMPLE_K))
    return _blocking_recall_frame(sample)


def _blocking_recall_frame(docs: DataFrame) -> DataFrame:
    """Shared audit body: exact 3-gram-Jaccard truth vs banded candidates
    over whatever doc frame the caller passes (the full corpus for the
    exhaustive diagnostic, the deterministic sample for the scale-safe
    judged protocol)."""
    truth = (D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
             .select("doc_a", "doc_b", "jaccard",
                     F.expr(_AUDIT_BUCKET).alias("bucket")))
    # candidates = distinct band collisions, composed directly from the
    # shared banding machinery. The audit never reads est_jaccard, and
    # skipping minhash_lsh_pairs' signature re-join removes a join whose
    # pair-shaped input Catalyst mis-estimates toward driver-breaking
    # broadcasts (observed: 1 GB broadcast OOM at sf10 on the
    # dup-saturated replica corpus — the same failure mode the r10
    # semantic verify hit). The remaining pair joins carry merge hints:
    # SMJ shuffles by key at any SF.
    cand = (D.band_candidates(D.minhash_band_keys(
                D.minhash_signatures(docs, "doc_id", "text", 3)))
            .hint("merge").cache())
    hits = (truth.hint("merge")
            .join(cand.withColumn("__hit", F.lit(1)),
                  ["doc_a", "doc_b"], "left")
            .select("bucket",
                    F.coalesce(F.col("__hit"), F.lit(0)).alias("hit")))
    by_bucket = (hits.groupBy("bucket")
                 .agg(F.count(F.lit(1)).alias("n_pairs"),
                      F.sum("hit").alias("n_caught")))
    all_true = hits.agg(
        F.lit("all_true").alias("bucket"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hit").alias("n_caught"))
    precision = (cand.join(truth.select("doc_a", "doc_b")
                           .withColumn("__true", F.lit(1)).hint("merge"),
                           ["doc_a", "doc_b"], "left")
                 .agg(F.lit("candidates").alias("bucket"),
                      F.count(F.lit(1)).alias("n_pairs"),
                      F.sum(F.coalesce(F.col("__true"), F.lit(0)))
                       .alias("n_caught")))
    unioned = by_bucket.unionByName(all_true).unionByName(precision)
    return (unioned.select(
        "bucket",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_caught").cast("long").alias("n_caught"),
        F.when(F.col("n_pairs") > 0,
               F.expr("(10000 * n_caught) DIV n_pairs"))
         .otherwise(F.lit(0)).cast("long").alias("rate_bp"))
        .orderBy("bucket"))


# ---------------------------------------------------------------------------
# UniMax: epoch-capped uniform domain mixing
# ---------------------------------------------------------------------------

_UNIMAX_EPOCHS = 2
_UNIMAX_BUDGET_DIV = 2


@query(
    "pipeline_unimax_mix",
    survey_ref="extensions: UniMax epoch-capped uniform mixing (Chung et "
               "al. 2023) — closed-form water-filling, two window passes",
    description="UniMax allocation over lang x source domains: uniform "
                "budget split, no domain beyond its epoch cap, "
                "sum(alloc) = budget exactly",
    oracle=f"""
    WITH grouped AS (
      SELECT lang || '/' || source AS domain, COUNT(*) AS n_d
      FROM documents GROUP BY 1),
    {C.sql_unimax_alloc("grouped", "domain", _UNIMAX_EPOCHS,
                        _UNIMAX_BUDGET_DIV)}
    SELECT domain, CAST(n_d AS BIGINT) AS n_docs,
           CAST(cap_docs AS BIGINT) AS cap_docs, alloc,
           CAST((10000 * alloc) // n_d AS BIGINT) AS epochs_bp
    FROM ux_alloc
    ORDER BY domain
    """,
)
def pipeline_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third judged mixture policy (after α=0.5 temperature and DSIR):
    UniMax shares the budget as uniformly as possible across lang x source
    domains but never samples any domain past _UNIMAX_EPOCHS epochs.
    Water-filling in closed form: domains sorted by capacity make the
    saturated set a prefix, so the whole allocation is two window passes —
    no iteration anywhere, identical int64 arithmetic in both engines.
    epochs_bp (basis points of one epoch actually used per domain) makes
    the fairness visible: small domains hit 20000 (the 2-epoch cap),
    large ones sit at the common water level."""
    docs = load_table(spark, sf_dir, "documents")
    grouped = (docs.groupBy(
        F.concat_ws("/", "lang", "source").alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_d")))
    alloc = C.unimax_alloc(grouped, "domain", _UNIMAX_EPOCHS,
                           _UNIMAX_BUDGET_DIV)
    return (alloc.select(
        "domain",
        F.col("n_d").cast("long").alias("n_docs"),
        F.col("cap_docs").cast("long").alias("cap_docs"),
        "alloc",
        F.expr("(10000 * alloc) DIV n_d").cast("long").alias("epochs_bp"))
        .orderBy("domain"))


# ---------------------------------------------------------------------------
# WebDataset-style tar shards
# ---------------------------------------------------------------------------

_TAR_SHARDS = 8


@query(
    "tar_shard_roundtrip_doc_stats",
    survey_ref="S4/K4 source formats: WebDataset-style tar-shard "
               "round-trip (applyInPandas shard writer, binaryFile + "
               "mapInPandas member reader)",
    description="Documents written as deterministic tar shards and read "
                "back member-by-member; per-shard stats prove byte-exact "
                "content round-trip",
    oracle=f"""
    SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def tar_shard_roundtrip_doc_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The multimodal-corpus interchange format: documents land as 8
    WebDataset-style tar shards (one applyInPandas writer task per
    shard, members sorted, headers pinned for determinism), then the
    shards are scanned back via binaryFile + a mapInPandas tarfile
    reader. The judged stats hash the ROUND-TRIPPED text (md5 of what
    came out of the tar), so a single corrupted byte anywhere in the
    write/read path breaks the value hash. At 100 TB the same plan
    writes ~100k shards of ~1 GB: shard assignment is one hash shuffle,
    and the reader's parallelism is the shard count."""
    import hashlib
    import os
    import tempfile

    from fictional_guacamole_spark.sources import tar_shards as T

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(
        f"tar_shards1:{src}:{os.path.getmtime(src)}:{_TAR_SHARDS}"
        .encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_tar_shards_{tag}")
    T.write_tar_shards(docs, base, _TAR_SHARDS)
    members = T.read_tar_shards(spark, base)
    return (members.groupBy(
        (F.col("member_id") % _TAR_SHARDS).cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_bytes").cast("long").alias("text_bytes"),
             F.sum(D.md5_long(F.col("text"))).cast("long")
              .alias("content_sum"))
        .orderBy("shard"))


# ---------------------------------------------------------------------------
# Fully-distributed Lloyd k-means over the real embedding vectors
# ---------------------------------------------------------------------------

@query(
    "cluster_kmeans_embeddings",
    survey_ref="extensions: distributed Lloyd k-means over the embeddings "
               "table (cluster-then-verify family; full-corpus assignment, "
               "no driver-side sample)",
    description="Two exact integer Lloyd rounds over quantized embedding "
                "vectors: per-cluster size, membership checksum, inertia",
    oracle=f"""
    WITH qv AS MATERIALIZED ({C.sql_quantized_embedding_rows()}),
    {C.sql_kmeans_rounds("qv")}
    SELECT cid, COUNT(*) AS n_members,
           CAST(SUM(doc) AS BIGINT) AS member_id_sum,
           CAST(SUM(dist) AS BIGINT) AS inertia
    FROM km_assign
    GROUP BY cid
    ORDER BY cid
    """,
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means the way you run it at 100 TB: centroids BROADCAST
    (k x dims rows), assignment a map-side expand x k followed by one
    groupBy, the update one more groupBy — never a driver-side loop over
    collected vectors (contrast: the IVF codebook trainer deliberately
    samples 4096 rows; this row certifies the full-corpus path the
    cluster-then-dedup/balance pipelines need). Integer quantization
    (FLOOR(x*2048)) + truncating DIV centroids make both Lloyd rounds
    bit-exact in both engines; the oracle replays the identical unrolled
    iteration, so sizes, membership AND inertia are value-judged."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = C.quantized_embedding_rows(emb)
    assign = C.kmeans_rounds(qv)
    return (assign.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum("doc").cast("long").alias("member_id_sum"),
                 F.sum("dist").cast("long").alias("inertia"))
            .orderBy("cid"))


@query(
    "dedup_exact_substring_apply",
    survey_ref="extensions: exact-substring dedup APPLIED — the removal "
               "transform (cleaned-text fingerprints judged per doc)",
    description="Documents with cross-doc duplicated spans removed: "
                "surviving word count and md5 of the exact cleaned text",
    oracle=D.sql_exact_substring_apply("documents", "doc_id", "text"),
)
def dedup_exact_substring_apply(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The companion transform to ``dedup_exact_substring``: not just an
    audit of duplicated spans but the ExactSubstr removal itself. The
    value hash pins the md5 of every document's CLEANED text (position-
    ordered rejoin of surviving words), so the judged row certifies the
    edit, word for word, across all 500 docs. Removal cost scales with
    duplicated words, not corpus size: span ranges explode to (doc, pos)
    keys and a left-anti join drops them — no second corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    return (D.exact_substring_apply(docs, "doc_id", "text")
            .orderBy("doc"))


# ---------------------------------------------------------------------------
# Semantic decontamination (the third decon mode: set, Bloom, embedding)
# ---------------------------------------------------------------------------

_DECON_PROBE_MOD = 10      # every 10th BASE vector spawns an eval probe
_DECON_PROBE_CEIL = 10_000_000   # probes come from the base id universe
# only (scale replicas stride ids by 1e8), so the eval suite is a FIXED
# set at every SF — the realistic shape: corpora grow, eval suites don't.
# The first sf10 attempt let the probe set scale with the corpus (50k
# probes) and the map-side expand went quadratic; this pin is the fix.


def _probe_qv(emb):
    """Quantized rows of the synthetic eval suite: every
    ``_DECON_PROBE_MOD``-th base-universe train vector with ONE doubled
    coordinate — a near-duplicate paraphrase of its origin (cos ~0.99),
    nothing else (the fixture vectors are near-orthogonal).
    Deterministic, so the oracle replays it bit-for-bit."""
    return (emb.filter((F.col("vec_id") % _DECON_PROBE_MOD == 0)
                       & (F.col("vec_id") < _DECON_PROBE_CEIL))
            .select(F.col("vec_id").alias("probe"),
                    F.posexplode("embedding").alias("dim", "x"))
            .select("probe", "dim",
                    F.floor(F.col("x").cast("double") * C.SEM_SCALE
                            * F.when(F.col("dim") == F.col("probe")
                                     % C.SEM_DIM, 2).otherwise(1))
                     .cast("long").alias("pq")))


_DECON_PROBE_SQL = f"""
      SELECT vec_id AS probe, i - 1 AS dim,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {C.SEM_SCALE}
                  * CASE WHEN i - 1 = vec_id % {C.SEM_DIM}
                         THEN 2 ELSE 1 END) AS BIGINT) AS pq
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS _pu(i)
      WHERE vec_id % {_DECON_PROBE_MOD} = 0
        AND vec_id < {_DECON_PROBE_CEIL}"""

# the tqv → hits → per_doc chain, shared verbatim by the decon row's
# oracle and the v2 capstone's (one rendering, no drift)
_DECON_HITS_CTES = f"""
    tqv AS MATERIALIZED ({C.sql_quantized_embedding_rows()}),
    pqv AS MATERIALIZED ({_DECON_PROBE_SQL}),
    tn AS (SELECT doc, SUM(q * q) AS n2 FROM tqv GROUP BY doc),
    pn AS (SELECT probe, SUM(pq * pq) AS p2 FROM pqv GROUP BY probe),
    dots AS (
      SELECT t.doc, p.probe, SUM(t.q * p.pq) AS dot
      FROM tqv t JOIN pqv p USING (dim)
      GROUP BY t.doc, p.probe),
    hits AS (
      SELECT d.doc, d.probe
      FROM dots d JOIN tn ON d.doc = tn.doc
                  JOIN pn ON d.probe = pn.probe
      WHERE d.dot >= 0 AND 100 * d.dot * d.dot >= 81 * tn.n2 * pn.p2),
    per_doc AS (
      SELECT doc, COUNT(*) AS n_probe_hits FROM hits GROUP BY doc)"""


def _decon_hit_counts(emb: DataFrame) -> DataFrame:
    """(doc, n_probe_hits) for every train vector with >= 1 eval-probe
    hit — the shared Spark core of the decon row and the v2 capstone."""
    tqv = C.quantized_embedding_rows(emb)
    pqv = _probe_qv(emb)
    tn = tqv.groupBy("doc").agg(
        F.sum(F.col("q") * F.col("q")).alias("n2"))
    pn = pqv.groupBy("probe").agg(
        F.sum(F.col("pq") * F.col("pq")).alias("p2"))
    dots = (tqv.join(F.broadcast(pqv), "dim")
            .groupBy("doc", "probe")
            .agg(F.sum(F.col("q") * F.col("pq")).alias("dot")))
    hits = (dots.join(tn, "doc").join(F.broadcast(pn), "probe")
            .filter((F.col("dot") >= 0)
                    & (F.lit(100) * F.col("dot") * F.col("dot")
                       >= F.lit(81) * F.col("n2") * F.col("p2")))
            .select("doc", "probe"))
    return hits.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_probe_hits"))


@query(
    "pipeline_decontaminate_semantic",
    survey_ref="extensions: SEMANTIC decontamination — train vectors vs a "
               "broadcast eval-probe suite, exact integer cosine (the "
               "third decon mode after set and Bloom)",
    description="Per-train-doc contamination flags against a perturbed "
                "eval-probe suite: exact integer cosine >= 0.9, probe "
                "side broadcast",
    oracle=f"""
    WITH {_DECON_HITS_CTES}
    SELECT b.vec_id AS doc,
           CAST(COALESCE(n_probe_hits, 0) AS BIGINT) AS n_probe_hits,
           COALESCE(n_probe_hits, 0) > 0 AS contaminated
    FROM embeddings b LEFT JOIN per_doc ON b.vec_id = per_doc.doc
    ORDER BY doc
    """,
)
def pipeline_decontaminate_semantic(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Embedding-space decontamination, completing the decon triad
    (exact-shingle set, Bloom bit-array, and now SEMANTIC): flag every
    training vector whose cosine to ANY eval-suite probe reaches 0.9 —
    the leakage n-gram matching can't see (paraphrases). The production
    shape exploits the asymmetry of the problem: eval suites are tiny
    relative to the corpus, so the probe side BROADCASTS and the train
    side never shuffles — assignment is a map-side expand x |probes|
    with partial aggregation, exactly like the set/Bloom siblings. The
    integer verify (dot >= 0, 100 dot^2 >= 81 na nb over FLOOR(x*2048)
    quantization) is the SemDeDup arithmetic, bit-identical in both
    engines. Probes here are deterministic one-doubled-coordinate
    perturbations of every 10th vector — near-dup 'paraphrases' of
    their origins and of nothing else, so negatives are certified too."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_doc = _decon_hit_counts(emb)
    return (emb.select(F.col("vec_id").alias("doc"))
            .join(per_doc, "doc", "left")
            .select("doc",
                    F.coalesce(F.col("n_probe_hits"), F.lit(0))
                     .cast("long").alias("n_probe_hits"),
                    (F.coalesce(F.col("n_probe_hits"), F.lit(0)) > 0)
                     .alias("contaminated"))
            .orderBy("doc"))


# ---------------------------------------------------------------------------
# Cluster-balanced diversification sample (the D4 diversify stage)
# ---------------------------------------------------------------------------

_CBS_PER_CLUSTER = 10


@query(
    "pipeline_cluster_balanced_sample",
    survey_ref="extensions: cluster-balanced diversification sampling "
               "(the D4 diversify stage, Tirumala et al. 2023) — uniform "
               "per-cluster quotas over the k-means partition",
    description="A diversity sample: k-means over quantized embeddings, "
                "then a deterministic md5 bottom-k quota per cluster",
    oracle=f"""
    WITH qv AS MATERIALIZED ({C.sql_quantized_embedding_rows()}),
    {C.sql_kmeans_rounds("qv")},
    ranked AS (
      SELECT doc, cid,
             ROW_NUMBER() OVER (
               PARTITION BY cid
               ORDER BY {D.sql_md5_long("'cbs:' || CAST(doc AS VARCHAR)")},
                        doc) AS rank
      FROM km_assign)
    SELECT doc, cid, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_CBS_PER_CLUSTER}
    ORDER BY cid, rank
    """,
)
def pipeline_cluster_balanced_sample(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The diversify stage of D4 (Tirumala et al. 2023: SemDeDup +
    cluster-based diversification beats either alone): partition the
    corpus with the judged distributed k-means, then draw a UNIFORM
    per-cluster quota so dense regions of embedding space cannot
    dominate the training mix. The draw is the engine's standard
    deterministic device — bottom-k by a salted md5 key — so both
    engines pick the identical sample. One extra shuffle over the
    k-means assignment (partition by cluster); the quota is a
    row_number cutoff, never a per-cluster collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = C.quantized_embedding_rows(emb)
    assign = C.kmeans_rounds(qv)
    wr = W.partitionBy("cid").orderBy(
        D.md5_long(F.concat(F.lit("cbs:"), F.col("doc").cast("string"))),
        "doc")
    return (assign.select("doc", "cid",
                          F.row_number().over(wr).cast("long").alias("rank"))
            .filter(F.col("rank") <= _CBS_PER_CLUSTER)
            .orderBy("cid", "rank"))


# ---------------------------------------------------------------------------
# Capstone v2: the second-wave layer composed into one judged manifest
# ---------------------------------------------------------------------------

_V2_MIN_KEPT = 20      # drop docs hollowed out by span removal
_V2_EPOCHS = 1
_V2_BUDGET_DIV = 2


@query(
    "pipeline_curation_corpus_v2",
    survey_ref="extensions: CAPSTONE v2 — ExactSubstr removal -> semantic "
               "decon gate -> UniMax quotas -> quality-weighted picks, one "
               "judged manifest",
    description="The second-wave curation pipeline end-to-end: span-"
                "cleaned docs, embedding-decontaminated, UniMax-allocated "
                "per language, picked by kept-words-weighted E-S keys",
    oracle=f"""
    WITH essa AS ({D.sql_exact_substring_apply("documents", "doc_id",
                                               "text")}),
    clean AS (
      SELECT doc, kept_words FROM essa
      WHERE kept_words >= {_V2_MIN_KEPT}),
    {_DECON_HITS_CTES},
    surv AS (
      SELECT c.doc, c.kept_words, d.lang
      FROM clean c JOIN documents d ON c.doc = d.doc_id
      WHERE c.doc NOT IN (SELECT doc FROM per_doc WHERE n_probe_hits > 0)),
    grouped AS (SELECT lang, COUNT(*) AS n_d FROM surv GROUP BY lang),
    {C.sql_unimax_alloc("grouped", "lang", _V2_EPOCHS, _V2_BUDGET_DIV)},
    ranked AS (
      SELECT s.doc, s.lang, s.kept_words,
             ROW_NUMBER() OVER (
               PARTITION BY s.lang
               ORDER BY {C.sql_weighted_sample_key(
                   "s.doc",
                   "GREATEST(1, LEAST(64, s.kept_words // 4))")},
                        s.doc) AS rank
      FROM surv s)
    SELECT r.doc, r.lang, CAST(r.kept_words AS BIGINT) AS kept_words,
           CAST(r.rank AS BIGINT) AS rank
    FROM ranked r JOIN ux_alloc a ON r.lang = a.lang
    WHERE r.rank <= a.alloc
    ORDER BY r.lang, r.rank
    """,
)
def pipeline_curation_corpus_v2(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The round-11 second wave composed into ONE Catalyst plan and one
    judged manifest — the pipeline a production pretraining-data run
    would execute with these operators: (1) ExactSubstr removal cleans
    every document and drops the ones hollowed below _V2_MIN_KEPT
    surviving words; (2) the semantic decon gate removes documents whose
    embedding matches an eval probe (docs without an embedding pass
    through — at the larger fixtures only a prefix of the corpus is
    embedded, which is realistic: you decontaminate what you can
    embed); (3) UniMax water-filling allocates the halved budget across
    languages under a 1-epoch cap; (4) each language's quota is filled
    by Efraimidis-Spirakis bottom-k keys weighted by CLEANED length
    (kept_words DIV 4, clamped to the replica cap) — quality-weighted
    where the v1 capstone weighted raw length. Every stage reuses its
    judged sibling's implementation verbatim (exact_substring_apply,
    the decon hit chain, unimax_alloc, weighted_sample_key), so the
    capstone certifies the COMPOSITION, not re-implementations."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    clean = (D.exact_substring_apply(docs, "doc_id", "text")
             .filter(F.col("kept_words") >= _V2_MIN_KEPT)
             .select("doc", "kept_words"))
    flagged = (_decon_hit_counts(emb)
               .filter(F.col("n_probe_hits") > 0).select("doc"))
    surv = (clean.join(flagged, "doc", "left_anti")
            .join(docs.select(F.col("doc_id").alias("doc"), "lang"),
                  "doc"))
    grouped = surv.groupBy("lang").agg(F.count(F.lit(1)).alias("n_d"))
    alloc = C.unimax_alloc(grouped, "lang", _V2_EPOCHS, _V2_BUDGET_DIV) \
        .select("lang", "alloc")
    weight = F.greatest(
        F.lit(1), F.least(F.lit(64), F.expr("kept_words DIV 4")))
    wr = W.partitionBy("lang").orderBy(
        C.weighted_sample_key(F.col("doc"), weight), "doc")
    ranked = surv.select(
        "doc", "lang", "kept_words",
        F.row_number().over(wr).cast("long").alias("rank"))
    return (ranked.join(F.broadcast(alloc), "lang")
            .filter(F.col("rank") <= F.col("alloc"))
            .select("doc", "lang",
                    F.col("kept_words").cast("long").alias("kept_words"),
                    "rank")
            .orderBy("lang", "rank"))


@query(
    "python_datasource_tar_stats",
    survey_ref="S4 source formats: Spark 4 Python DataSource API "
               "(pyspark.sql.datasource) — custom fg_tarshard format, one "
               "InputPartition per shard",
    description="The tar shards read through a registered custom Python "
                "DataSource (spark.read.format('fg_tarshard')) instead of "
                "binaryFile+mapInPandas; identical judged stats",
    oracle=f"""
    SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def python_datasource_tar_stats(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The same shard corpus as ``tar_shard_roundtrip_doc_stats``, read
    through Spark 4's Python DataSource API (SPARK-44076) — the
    sanctioned extension point for formats Spark lacks, and the repo's
    first judged row on it. ``partitions()`` emits one InputPartition
    per shard on the driver; each executor task opens exactly its own
    tar and streams members as tuples. The judged stats hash the
    ROUND-TRIPPED text again, so both the custom source's partition
    planning AND its member decoding are value-certified against the
    raw fixture. (binaryFile+mapInPandas remains the sibling path; two
    implementations, one oracle, zero drift.)"""
    import hashlib
    import os
    import tempfile

    from fictional_guacamole_spark.sources import tar_shards as T
    from fictional_guacamole_spark.sources.pyds import read_tar_shards_pyds

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(
        f"tar_shards1:{src}:{os.path.getmtime(src)}:{_TAR_SHARDS}"
        .encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_tar_shards_{tag}")
    T.write_tar_shards(docs, base, _TAR_SHARDS)
    members = read_tar_shards_pyds(spark, base)
    return (members.groupBy(
        (F.col("member_id") % _TAR_SHARDS).cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_bytes").cast("long").alias("text_bytes"),
             F.sum(D.md5_long(F.col("text"))).cast("long")
              .alias("content_sum"))
        .orderBy("shard"))


@query(
    "stream_engine_pyds_tar_source",
    survey_ref="§2.5 streaming + S4: a CUSTOM Python streaming source "
               "(DataSourceStreamReader) executed through the micro-batch "
               "engine — source-owned offsets, one shard per trigger",
    description="The tar shards replayed through a custom Python "
                "DataSourceStreamReader (one shard per micro-batch) into "
                "a streaming aggregation; drained state judged against "
                "the raw fixture",
    oracle=f"""
    SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def stream_engine_pyds_tar_source(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The first judged row on a CUSTOM Python streaming source: Spark
    4's DataSourceStreamReader hands the engine source-owned offsets
    ({"shard": i} dicts the checkpoint persists), plans one shard per
    micro-batch (latestOffset advances one step per poll — the
    maxFilesPerTrigger idea implemented inside the source), and streams
    members from executor-side tarfile reads. The drain therefore
    crosses >= 8 triggers of genuinely incremental state before the
    complete-mode aggregation is judged against the raw fixture — and
    the stats hash the round-tripped text, so offset planning, member
    decode AND state accumulation are all value-certified. This is the
    production shape for 'my corpus format has no Spark reader': own
    the offsets, let the engine own recovery."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from fictional_guacamole_spark.plans.windows_streaming import (
        _stream_state_partitions)
    from fictional_guacamole_spark.sources import tar_shards as T
    from fictional_guacamole_spark.sources.pyds import (
        read_tar_shards_stream)

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(
        f"tar_shards1:{src}:{os.path.getmtime(src)}:{_TAR_SHARDS}"
        .encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_tar_shards_{tag}")
    T.write_tar_shards(docs, base, _TAR_SHARDS)

    stream = read_tar_shards_stream(spark, base)
    agg = (stream.groupBy(
        (F.col("member_id") % _TAR_SHARDS).cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_bytes").cast("long").alias("text_bytes"),
             F.sum(D.md5_long(F.col("text"))).cast("long")
              .alias("content_sum")))
    name = f"fg_pyds_stream_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="fg_pyds_ckpt_")
    with _stream_state_partitions(spark):
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
            n_batches = len(q.recentProgress)
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    assert n_batches >= _TAR_SHARDS, (
        f"expected >= {_TAR_SHARDS} micro-batches (one per shard), "
        f"saw {n_batches}")
    return spark.table(name).orderBy("shard")


# ---------------------------------------------------------------------------
# TIFF: the eighth from-the-spec stdlib codec (baseline multi-strip RGB)
# ---------------------------------------------------------------------------

_TIFF_W, _TIFF_H, _TIFF_RPS = 8, 8, 4   # 2 strips of 4 rows: external
_TIFF_N = _TIFF_W * _TIFF_H * 3         # offset/count arrays exercised


@query(
    "multimodal_tiff_decode",
    survey_ref="extensions: REAL image decode (baseline TIFF 6.0 — IFD "
               "tag walk, external value blocks, multi-strip assembly)",
    description="Documents rendered as real 2-strip baseline TIFFs and "
                "decoded by the actual IFD parser; per-strip and "
                "per-channel sums judged bit-exact",
    oracle=f"""
    WITH cyc AS (
      SELECT doc_id AS asset_id,
             substr(repeat(atext, CAST(({_TIFF_N} / length(atext))
                                       AS INT) + 1),
                    1, {_TIFF_N}) AS px
      FROM (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS atext
            FROM documents)
      WHERE length(atext) > 0)
    SELECT asset_id,
           CAST({_TIFF_W} AS INTEGER) AS width,
           CAST({_TIFF_H} AS INTEGER) AS height,
           CAST(2 AS INTEGER) AS n_strips,
           CAST(list_sum(list_transform(range(1, {_TIFF_N // 2} + 1),
               p -> unicode(substr(px, CAST(p AS INT), 1))))
             AS BIGINT) AS strip0_sum,
           CAST(list_sum(list_transform(range({_TIFF_N // 2} + 1,
                                              {_TIFF_N} + 1),
               p -> unicode(substr(px, CAST(p AS INT), 1))))
             AS BIGINT) AS strip1_sum,
           CAST(list_sum(list_transform(range(0, {_TIFF_N // 3}),
               i -> unicode(substr(px, CAST(i * 3 + 1 AS INT), 1))))
             AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, {_TIFF_N // 3}),
               i -> unicode(substr(px, CAST(i * 3 + 2 AS INT), 1))))
             AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, {_TIFF_N // 3}),
               i -> unicode(substr(px, CAST(i * 3 + 3 AS INT), 1))))
             AS BIGINT) AS sum_b
    FROM cyc ORDER BY asset_id
    """,
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eighth real from-the-spec codec (after WAV/BMP/AVI/PNG/GIF/
    JPEG/JPEG-4:2:0), and the container scanned-document corpora
    actually ship: baseline TIFF 6.0. The encoder writes a little-endian
    IFD with EXTERNAL value blocks (BitsPerSample, StripOffsets,
    StripByteCounts — arrays wider than the 4-byte inline field, the
    part naive parsers get wrong) and splits the raster across 2 strips;
    the REAL parser walks the IFD, resolves inline-vs-external values by
    the spec's size rule, bounds-checks and reassembles the strips. The
    judged stats include PER-STRIP byte sums, so a parser that got strip
    boundaries wrong but totals right still fails. TIFF stores RGB
    top-down — the opposite layout of the judged BMP row's bottom-up BGR
    — so the two rows certify the two raster conventions independently.
    One map-only mapInPandas stage; no shuffle."""
    import pandas as pd

    from fictional_guacamole_spark.functions import codecs as CODECS

    docs = load_table(spark, sf_dir, "documents")
    ascii_col = F.regexp_replace("text", r"[^ -~]", "")

    def encode_decode(it):
        import re
        for pdf in it:
            out = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                raw = re.sub(r"[^ -~]", "", str(t)).encode()
                px = (raw * (_TIFF_N // len(raw) + 1))[:_TIFF_N]
                payload = CODECS.encode_tiff_rgb(
                    _TIFF_W, _TIFF_H, px, _TIFF_RPS)
                out.append({"asset_id": doc_id,
                            **CODECS.tiff_stats(payload)})
            yield pd.DataFrame(out)

    return (docs.select("doc_id", "text")
            .filter(F.length(ascii_col) > 0)
            .mapInPandas(encode_decode,
                         schema="asset_id long, width int, height int, "
                                "n_strips int, strip0_sum long, "
                                "strip1_sum long, sum_r long, sum_g long, "
                                "sum_b long")
            .orderBy("asset_id"))


@query(
    "python_datasource_tar_write_stats",
    survey_ref="K4 sinks + S4: the Python DataSource WRITE path "
               "(DataSourceWriter two-phase commit) — save through the "
               "registered format, read back through its own reader",
    description="Documents written through df.write.format('fg_tarshard') "
                "(per-task temp shards, driver-side atomic commit) and "
                "read back through the same registered source",
    oracle=f"""
    SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def python_datasource_tar_write_stats(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """The WRITE half of the Python DataSource API, completing the
    read/stream/write triad on the registered format: each task streams
    its partition into a hidden temp shard and returns a
    WriterCommitMessage; the DRIVER publishes every temp atomically in
    commit() only after all tasks succeed (abort() removes them
    otherwise) — the engine's no-torn-output file-sink contract,
    implemented at the source level. The frame is repartitioned on the
    shard key before save, so member placement is the one hash shuffle;
    the read-back goes through the SAME registered reader and the
    judged stats hash the round-tripped text — a torn commit, a lost
    member, or a mis-decoded byte all break the value hash."""
    import hashlib
    import os
    import tempfile

    from fictional_guacamole_spark.sources.pyds import (
        TarShardDataSource, _register_by_value, read_tar_shards_pyds)

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(
        f"pydsw1:{src}:{os.path.getmtime(src)}:{_TAR_SHARDS}"
        .encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_pydsw_{tag}")
    _register_by_value(spark, TarShardDataSource)
    if not os.path.exists(base):
        # write into a private uuid build dir and publish with one atomic
        # rename (the repo's fixture pattern, tar_shards.write_tar_shards):
        # the executor tasks create the dir before the driver commits, so
        # gating on the FINAL path's existence alone would let a crashed
        # prior write poison the cache (r11 advisor, ADVICE.md corpus:885)
        import uuid

        build = f"{base}.build.{uuid.uuid4().hex}"
        (docs.select(F.col("doc_id").alias("member_id"), "text")
         .repartition(_TAR_SHARDS, F.col("member_id") % _TAR_SHARDS)
         .write.format("fg_tarshard").option("path", build)
         .mode("append").save())
        try:
            os.rename(build, base)
        except OSError:
            if not os.path.exists(base):   # lost a benign publish race
                raise
            import shutil
            shutil.rmtree(build, ignore_errors=True)
    members = read_tar_shards_pyds(spark, base)
    return (members.groupBy(
        (F.col("member_id") % _TAR_SHARDS).cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_bytes").cast("long").alias("text_bytes"),
             F.sum(D.md5_long(F.col("text"))).cast("long")
              .alias("content_sum"))
        .orderBy("shard"))


@query(
    "stream_engine_pyds_tar_sink",
    survey_ref="K1/K4 + §2.5 streaming: a CUSTOM Python STREAMING SINK "
               "(DataSourceStreamWriter) — per-epoch two-phase commit, "
               "idempotent (batchId, taskId) shard names",
    description="Custom Python stream source feeding a custom Python "
                "stream sink through the engine; the sink's epoch shards "
                "read back and judged against the raw fixture",
    oracle=f"""
    SELECT CAST(doc_id % {_TAR_SHARDS} AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def stream_engine_pyds_tar_sink(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The fourth and last Python DataSource surface, judged: a custom
    STREAMING SINK with per-epoch two-phase commit. The pipeline is
    entirely custom-source → engine → custom-sink: the tar shards
    stream in one-per-micro-batch, and every epoch's tasks write temp
    shards that the DRIVER publishes under deterministic
    (batchId, taskId) names via os.replace — so a replayed epoch
    OVERWRITES its own previous output instead of duplicating it
    (sink-side idempotence, the file-sink/txn-log contract at the
    source level; re-run determinism is asserted byte-for-byte in
    tests). The judged read-back of the sink's own output against the
    raw fixture certifies offset planning, epoch commit AND member
    round-trip in one value hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    from fictional_guacamole_spark.plans.windows_streaming import (
        _stream_state_partitions)
    from fictional_guacamole_spark.sources import tar_shards as T
    from fictional_guacamole_spark.sources.pyds import (
        TarShardSinkDataSource, _register_by_value, read_tar_shards_pyds,
        read_tar_shards_stream)

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(
        f"tar_shards1:{src}:{os.path.getmtime(src)}:{_TAR_SHARDS}"
        .encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"fg_tar_shards_{tag}")
    T.write_tar_shards(docs, base, _TAR_SHARDS)

    out = os.path.join(tempfile.gettempdir(), f"fg_pyds_sink_{tag}")
    if not os.path.exists(os.path.join(out, "_DRAINED")):
        # drain into a private uuid build dir, mark it _DRAINED, then
        # publish with one atomic rename — a crashed or concurrent drain
        # can never leave a half-filled ``out`` that later runs trust
        # (r11 advisor/verdict: match the repo's build-dir pattern)
        import uuid

        build = f"{out}.build.{uuid.uuid4().hex}"
        _register_by_value(spark, TarShardSinkDataSource)
        stream = read_tar_shards_stream(spark, base) \
            .select("member_id", "text")
        ckpt = tempfile.mkdtemp(prefix="fg_pyds_sink_ckpt_")
        with _stream_state_partitions(spark):
            q = (stream.writeStream.format("fg_tarshard_sink")
                 .option("path", build)
                 .option("checkpointLocation", ckpt)
                 .start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                shutil.rmtree(ckpt, ignore_errors=True)
        open(os.path.join(build, "_DRAINED"), "w").close()
        try:
            shutil.rmtree(out, ignore_errors=True)  # stale marker-less dir
            os.rename(build, out)
        except OSError:
            if not os.path.exists(os.path.join(out, "_DRAINED")):
                raise
            shutil.rmtree(build, ignore_errors=True)
    members = read_tar_shards_pyds(spark, out)
    return (members.groupBy(
        (F.col("member_id") % _TAR_SHARDS).cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_bytes").cast("long").alias("text_bytes"),
             F.sum(D.md5_long(F.col("text"))).cast("long")
              .alias("content_sum"))
        .orderBy("shard"))

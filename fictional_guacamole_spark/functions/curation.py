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

Reference scope note: the reference app (process_gdax.py, process_book.py)
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
- **Semantic dedup**: SemDeDup-shaped (Abbas et al. 2023) — embed, bucket,
  verify cosine, cluster, keep one representative. The embedding is a
  64-dim feature-hashed token-count vector (integer), candidate buckets are
  bands of a 48-bit random-hyperplane signature whose ±1 signs derive from
  md5 parity (integer sums — order-independent, GROUP-BY-safe in both
  engines), and the cosine-threshold verify is exact integer arithmetic:
  ``cos(a,b) ≥ τ = p/q  ⟺  q²·dot² ≥ p²·|a|²·|b|²`` for non-negative count
  vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions.dedup import md5_long, sql_md5_long
from fictional_guacamole_spark.functions.text import TOKEN_PATTERN, normalize

# --- shared constants (must match the SQL renderings) -----------------------

HASH_DIM = 64          # feature-hashing bucket count for the doc embedding
SIG_BITS = 48          # sign-signature length
SIG_BANDS = 6          # bands × band_bits = SIG_BITS
BAND_BITS = SIG_BITS // SIG_BANDS
W_CAP = 64             # weighted-sampling replica cap (weights clip here)


# --- weighted bottom-k sampling ---------------------------------------------

def weighted_sample_key(id_col: Column, weight_col: Column) -> Column:
    """Efraimidis–Spirakis sampling key, integer-exact: the min of
    ``w`` iid md5 draws ranks identically to ``Exp(w)`` (the E-S key).
    ``weight_col`` must already be clipped to [1, W_CAP]."""
    draws = F.transform(
        F.sequence(F.lit(1), weight_col.cast("int")),
        lambda i: md5_long(F.concat_ws(
            ":", id_col.cast("string"), i.cast("string"))))
    return F.array_min(draws)


def sql_weighted_sample_key(id_expr: str, weight_expr: str) -> str:
    """DuckDB rendering of :func:`weighted_sample_key` (identical draws)."""
    draw = sql_md5_long(
        f"CAST({id_expr} AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
    return (f"list_min(list_transform("
            f"generate_series(1, CAST({weight_expr} AS INT)), i -> {draw}))")


# --- feature-hashed document embedding (sparse integer TF) ------------------

def hashed_tf(docs: DataFrame, id_col: str, text_col: str,
              dim: int = HASH_DIM) -> DataFrame:
    """Sparse feature-hashed token-count embedding: (doc, dim, c) rows.

    One explode + one map-side-combined groupBy; at 100 TB this is the
    scan-speed 'embed' stage (a real pipeline swaps in a neural encoder —
    the downstream bucket/verify/cluster plumbing is identical)."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize(F.col(text_col)), " ")).alias("t"))
    toks = toks.filter(F.col("t") != "")
    return (toks.select("doc", (md5_long(F.col("t")) % dim).alias("dim"))
            .groupBy("doc", "dim")
            .agg(F.count(F.lit(1)).alias("c")))


def sql_hashed_tf(table: str, id_col: str, text_col: str,
                  dim: int = HASH_DIM) -> str:
    norm = f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
    return f"""
      SELECT {id_col} AS doc, {sql_md5_long('t')} % {dim} AS dim,
             COUNT(*) AS c
      FROM (SELECT {id_col}, unnest(string_split({norm}, ' ')) AS t
            FROM {table}) _sem_toks
      WHERE t <> ''
      GROUP BY doc, dim"""


# --- sign-band buckets over the hashed embedding ----------------------------

def _sign_table(sig_bits: int = SIG_BITS,
                dim: int = HASH_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane entries: md5("sem:b:d") parity. Only
    sig_bits×dim values exist, so the Spark side bakes them in as literals
    (hashlib md5 ≡ engine md5 — parity asserted in tests/test_curation.py)
    while the SQL oracle recomputes the identical parity inline."""
    import hashlib
    return [[1 if int(hashlib.md5(f"sem:{b}:{d}".encode())
                      .hexdigest()[:8], 16) % 2 == 0 else -1
             for d in range(dim)]
            for b in range(sig_bits)]


def sign_band_buckets(tf: DataFrame, sig_bits: int = SIG_BITS,
                      band_bits: int = BAND_BITS) -> DataFrame:
    """(doc, band, bucket): each bucket packs ``band_bits`` sign tests of
    the hashed-TF vector against md5-derived ±1 hyperplanes. All sums are
    INTEGER (±c contributions), so aggregation order cannot perturb the
    result — the GROUP BY is safe in any engine, any parallelism.

    Physical shape: per TF row, ONE lookup into a single 2D ±1 literal
    (indexed by dim, then all sig_bits signs at once) feeds a
    posexplode — no runtime hashing, no per-bit expression fan-out, so
    the plan stays small and whole-stage-codegen-friendly. The signed
    sums combine map-side; the shuffle carries (doc, bit) longs.

    Near-identical vectors collide in every band; the band-bit count sets
    the bucket granularity (raise it as the corpus grows — the judged
    48/6 layout gives high pair recall at cos ≥ 0.95 while keeping
    buckets small; see tests/test_curation.py for the measured floor)."""
    # transpose: signs_by_dim[d][b] — one element_at per row fetches the
    # row's full sign column, the lambda scales it by the count
    table = _sign_table(sig_bits)
    signs_by_dim = F.lit([[table[b][d] for b in range(sig_bits)]
                          for d in range(HASH_DIM)])
    contribs = F.transform(
        F.element_at(signs_by_dim, F.col("dim").cast("int") + 1),
        lambda s: s.cast("long") * F.col("c"))
    sums = (tf.select("doc", F.posexplode(contribs).alias("b", "contrib"))
            .groupBy("doc", "b").agg(F.sum("contrib").alias("s")))
    return (sums.select(
                "doc",
                F.expr(f"CAST(b DIV {band_bits} AS INT)").alias("band"),
                F.when(F.col("s") > 0,
                       F.expr(f"shiftleft(1, CAST(b % {band_bits} AS INT))"))
                 .otherwise(F.lit(0)).cast("long").alias("bitval"))
            .groupBy("doc", "band")
            .agg(F.sum("bitval").alias("bucket")))


def sql_sign_band_buckets(tf_cte: str, sig_bits: int = SIG_BITS,
                          band_bits: int = BAND_BITS) -> str:
    """DuckDB rendering of :func:`sign_band_buckets` over a named TF CTE."""
    sign = (f"CASE WHEN {sql_md5_long(_SEM_SIGN_KEY)} % 2 = 0 "
            f"THEN c ELSE -c END")
    return f"""
      SELECT doc, b // {band_bits} AS band,
             SUM(CASE WHEN s > 0 THEN 1 << (b % {band_bits}) ELSE 0 END)
               AS bucket
      FROM (
        SELECT doc, g.b, SUM({sign}) AS s
        FROM {tf_cte} CROSS JOIN
             (SELECT unnest(generate_series(0, {sig_bits - 1})) AS b) g
        GROUP BY doc, g.b) _sem_sums
      GROUP BY doc, band"""


_SEM_SIGN_KEY = ("'sem:' || CAST(b AS VARCHAR) || ':' || "
                 "CAST(dim AS VARCHAR)")


# --- exact integer cosine verification --------------------------------------

def semantic_pairs(docs: DataFrame, id_col: str, text_col: str,
                   tau_num: int = 19, tau_den: int = 20) -> DataFrame:
    """(doc_a, doc_b) pairs with hashed-TF cosine ≥ tau_num/tau_den,
    candidates from sign-band buckets, verified in EXACT integer
    arithmetic (cross-multiplied squares — count vectors are non-negative
    so the sign check is free). Default τ = 0.95.

    100 TB shape: embed map-side → 6 band equi-joins (never all-pairs) →
    per-candidate sparse dot (equi-join on dim) → integer compare. The
    quadratic blow-up surface is bucket size, bounded by band_bits."""
    # Both tf and sig are reused (tf: candidate dot + norms; sig: the
    # band self-join). localCheckpoint materializes each once AND
    # truncates lineage — without it every reuse re-analyzes the
    # 48-aggregate literal-table subtree, which dominates wall time at
    # small SF and compounds plan size at any SF.
    tf = hashed_tf(docs, id_col, text_col).localCheckpoint(eager=True)
    sig = sign_band_buckets(tf).localCheckpoint(eager=True)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"))
            .distinct())
    x, y = tf.alias("x"), tf.alias("y")
    dots = (cand.join(x, F.col("x.doc") == F.col("doc_a"))
            .join(y, (F.col("y.doc") == F.col("doc_b"))
                  & (F.col("y.dim") == F.col("x.dim")))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("x.c") * F.col("y.c")).alias("dot")))
    nrm = tf.groupBy("doc").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    return (dots
            .join(nrm.select(F.col("doc").alias("doc_a"),
                             F.col("n2").alias("na")), "doc_a")
            .join(nrm.select(F.col("doc").alias("doc_b"),
                             F.col("n2").alias("nb")), "doc_b")
            .filter(F.lit(tau_den * tau_den) * F.col("dot") * F.col("dot")
                    >= F.lit(tau_num * tau_num) * F.col("na") * F.col("nb"))
            .select("doc_a", "doc_b"))


def sql_semantic_pairs(table: str, id_col: str, text_col: str,
                       tau_num: int = 19, tau_den: int = 20) -> str:
    """Standalone SELECT for :func:`semantic_pairs` (composable into
    sql_dedup_components' pairs slot). CTE names are module-unique (the
    DuckDB nested-CTE shadowing bug recorded in SCALE.md)."""
    tf = sql_hashed_tf(table, id_col, text_col)
    sig = sql_sign_band_buckets("semtf")
    return f"""
    SELECT doc_a, doc_b FROM (
      WITH semtf AS MATERIALIZED ({tf}),
      semsig AS MATERIALIZED ({sig}),
      semnrm AS MATERIALIZED (
        SELECT doc, SUM(c * c) AS n2 FROM semtf GROUP BY doc),
      semcand AS MATERIALIZED (
        SELECT DISTINCT sa.doc AS doc_a, sb.doc AS doc_b
        FROM semsig sa JOIN semsig sb
          ON sa.band = sb.band AND sa.bucket = sb.bucket
             AND sa.doc < sb.doc),
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

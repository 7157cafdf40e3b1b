"""Graph analytics queries over the fixture star schema.

The purchase relation (orders ⋈ lineitem → who bought from whom) induces a
bipartite customer↔supplier graph; PageRank over it is the canonical
"which suppliers matter" centrality — the same shape a training-data
pipeline runs over web-crawl link graphs to pick seed domains. The
connected-components sibling lives in functions/dedup.py (judged as
``dedup_components``); this module holds the ranking side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions.graph import (
    pagerank_ppb, sql_kcore, sql_pagerank_ppb, sql_triangle_census)
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table

_EDGES_CTE = """
      SELECT 'c' || ck AS src, 's' || sk AS dst FROM (
        SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
      UNION ALL
      SELECT 's' || sk, 'c' || ck FROM (
        SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey)"""


_RCTE_BODY = """
WITH RECURSIVE __edges AS (
  SELECT DISTINCT prev, event_type AS next FROM (
    SELECT event_type,
      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS prev
    FROM {events}) WHERE prev IS NOT NULL),
walk(node, depth, path) AS (
  SELECT CAST('view' AS {strtype}), 0, CAST('view' AS {strtype})
  UNION ALL
  SELECT e.next, w.depth + 1, w.path || '>' || e.next
  FROM walk w JOIN __edges e ON e.prev = w.node
  WHERE w.depth < 3)
SELECT node, depth, path FROM walk
"""


@query(
    "rcte_event_type_reachability",
    survey_ref="extensions: recursive CTE (bounded graph traversal)",
    description="All <=3-hop paths from 'view' through the observed "
                "event-type transition graph (WITH RECURSIVE)",
    oracle=_RCTE_BODY.format(events="events", strtype="VARCHAR")
    + " ORDER BY depth, path",
)
def rcte_event_type_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iteration as a QUERY-LANGUAGE surface, not a Python loop: Spark 4's
    ``WITH RECURSIVE`` (SPARK-24497) enumerates every path of length <= 3
    from 'view' through the event-type transition graph (edges = distinct
    consecutive pairs per user's time-ordered stream). The depth guard
    bounds the recursion on both engines identically, path strings make
    rows unique without relying on either engine's cycle handling, and the
    edge derivation is one lag window + distinct. The PageRank sibling
    above iterates in the driver because its trip count is fixed; this one
    shows the engine-native recursion the reference's SQLite (3.6-era)
    never had."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_rcte")
    return (spark.sql(_RCTE_BODY.format(events="events_rcte",
                                        strtype="STRING"))
            .orderBy("depth", "path"))


@query(
    "graph_pagerank_suppliers",
    survey_ref="extensions: graph centrality (PageRank, exact integer ppb)",
    description="Top-20 purchase-graph nodes by 3-round PageRank "
                "(symmetric customer<->supplier edges, integer ppb mass)",
    oracle=sql_pagerank_ppb(_EDGES_CTE, iters=3)
    + " ORDER BY rank_ppb DESC, node LIMIT 20",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 synchronous rounds, damping 85/100) over the symmetric
    customer↔supplier purchase graph. Edges derive from one orders⋈lineitem
    equi-join deduplicated to distinct (custkey, suppkey) pairs, then
    mirrored so the bipartite graph conserves rank mass in both directions.
    Functions/graph.py::pagerank_ppb does the iterating: per round one
    edges⋈ranks equi-join + one inflow groupBy — node-keyed shuffles only,
    never pair-keyed — and exact integer-ppb arithmetic makes the judged
    hash certify every rank to the 10^-9. Suppliers dominate the top ranks
    structurally (100 suppliers absorb inflow from 1500 customers at
    sf0.01), which the fixture's uniform order distribution makes visible
    as s-prefixed nodes leading the list."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(lineitem,
                         orders.o_orderkey == lineitem.l_orderkey)
             .select(F.col("o_custkey").alias("ck"),
                     F.col("l_suppkey").alias("sk"))
             .distinct())
    c_node = F.concat(F.lit("c"), F.col("ck").cast("string"))
    s_node = F.concat(F.lit("s"), F.col("sk").cast("string"))
    edges = (pairs.select(c_node.alias("src"), s_node.alias("dst"))
             .unionByName(pairs.select(s_node.alias("src"),
                                       c_node.alias("dst"))))
    return (pagerank_ppb(edges, iters=3)
            .orderBy(F.desc("rank_ppb"), F.asc("node"))
            .limit(20))


# one-pass projection: shared counts and their global mean come from the
# SAME aggregation via a window, so the heavy pair join runs once on both
# engines (DuckDB inlines plain CTEs; the census wrapper additionally
# MATERIALIZEs the edge set it references four times)
def _cosupp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The judged one-mode co-supplier projection (suppliers sharing
    strictly more distinct customers than the supplier-pair mean) —
    shared by the triangle census and the k-core row so the graph under
    both statistics is identical by construction. Returned LAZY: the
    census deliberately re-evaluates it inline (see the comment in
    graph_triangle_census), while k-core checkpoints its symmetrized
    form once before peeling."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_suppkey").alias("s"))
          .distinct())
    a = cs.select(F.col("c"), F.col("s").alias("i"))
    b = cs.select(F.col("c").alias("c2"), F.col("s").alias("j"))
    w = (a.join(b, (F.col("c") == F.col("c2"))
                & (F.col("i") < F.col("j")))
         .groupBy("i", "j").agg(F.count(F.lit(1)).alias("shared")))
    return (w.withColumn("mu", F.avg("shared").over(
                 W.partitionBy(F.lit(1))))
            .filter(F.col("shared") > F.col("mu"))
            .select("i", "j"))


_COSUPP_EDGES_CTE = """
      SELECT i, j FROM (
        SELECT a.s AS i, b.s AS j, COUNT(*) AS shared,
               AVG(COUNT(*)) OVER () AS mu
        FROM (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey) a
        JOIN (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey) b
          ON a.c = b.c AND a.s < b.s
        GROUP BY a.s, b.s)
      WHERE shared > mu"""


@query(
    "graph_triangle_census",
    survey_ref="extensions: exact TRIANGLE CENSUS (compact-forward "
               "oriented-wedge join) + global clustering coefficient",
    description="Triangles, wedges and global clustering of the "
                "co-supplier graph (suppliers sharing more customers "
                "than the mean pair)",
    oracle=sql_triangle_census(_COSUPP_EDGES_CTE),
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting — the third classic whole-graph statistic after
    PageRank (graph_pagerank_suppliers) and connected components
    (dedup_components), and the building block of clustering/community
    metrics. The customer-supplier purchase relation is bipartite
    (triangle-free by construction), so the judged graph is its
    one-mode PROJECTION: suppliers joined when they share strictly more
    distinct customers than the supplier-pair mean — an SF-adaptive
    cut that stays non-degenerate at every fixture scale (sf0.001: 26
    edges / 37 triangles; sf0.01: 2 476 / 30 962 of a possible 161 700)
    where any absolute threshold collapses to the empty or complete
    graph. Census math: canonical i<j orientation finds each triangle
    exactly once as wedge (i,j)+(j,k) closed by (i,k) — two node-keyed
    equi-joins (Suri & Vassilvitskii, WWW'11); wedges are the exact
    integer degree fold; clustering = 3T/W is the one IEEE division.
    At 100 TB the projection step is the guarded part (shared-neighbor
    joins explode on hub customers — the same reason dedup's banded
    joins bucket first); the census joins then run over DEGREE-oriented
    edges (orient_by_degree) so each key's fan-out is bounded by
    ~sqrt(|E|) even on a hub-skewed graph — the census is
    orientation-invariant, so the id-oriented oracle replays it
    bit-identically. All exact — no sampling, no sketch."""
    from fictional_guacamole_spark.functions.graph import (
        orient_by_degree, triangle_census)

    edges = _cosupp_edges(spark, sf_dir)
    # The census + orientation reference this edge subplan ~8 times; it
    # stays INLINE deliberately: each re-evaluation is one all-broadcast
    # whole-stage-codegen pass (~0.15 s warm at the judged SF), while a
    # .persist() barrier costs more than it saves here (measured 9 s vs
    # 2 s cold) by serializing the cache write and downgrading the census
    # joins to shuffles. At 100 TB the staging flips: materialize the
    # reduced edge list once (it's a reduction), then census — exactly
    # what the oracle's MATERIALIZED edge CTE does.
    return triangle_census(orient_by_degree(edges))


@query(
    "graph_kcore_membership",
    survey_ref="extensions: k-CORE decomposition (iterative peeling with "
               "a FULL value oracle via bounded unroll)",
    description="3-core membership + in-core degree of the co-supplier "
                "graph after 8 synchronized peeling rounds",
    oracle="WITH " + sql_kcore(_COSUPP_EDGES_CTE, k=3, rounds=8)
    + " ORDER BY node",
)
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Matula & Beck 1983) — the fourth classic
    whole-graph statistic in the judged family (PageRank / components /
    triangle census / k-core), and the standard dense-subgraph filter a
    link-graph pipeline runs before expensive per-node work. Each
    peeling round drops every node with degree < 3 INSIDE the surviving
    subgraph; the judged form runs a FIXED 8 synchronized rounds so
    DuckDB can replay it as a plain CTE unroll — a recursive CTE cannot
    express peeling because each round must reference the previous
    survivor set twice (both join endpoints). Fixture peeling reaches
    fixpoint well inside 8 rounds (asserted in tests), making the
    judged output the true 3-core; an unconverged corpus still judges
    identically because both engines run the same bounded unroll.

    100 TB shape: per round one self-equi-join + one map-side-combined
    degree count over the SURVIVING edges — work shrinks monotonically
    as the graph peels; inter-round state is one node list
    (localCheckpointed, plans stay flat). Same co-supplier projection
    as the triangle census (_cosupp_edges) — one graph, four judged
    statistics."""
    from fictional_guacamole_spark.functions.graph import kcore

    return (kcore(_cosupp_edges(spark, sf_dir), k=3, rounds=8)
            .orderBy("node"))

"""Unit tests for the graph family (functions/graph.py): PageRank's exact
integer arithmetic on graphs whose fixed points are computable by hand, plus
mass-conservation bounds — the oracle-parity test covers the fixture path.
"""

from __future__ import annotations

import pytest

from fictional_guacamole_spark.functions.graph import (
    PR_TOTAL_PPB, pagerank_ppb)


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank_ppb"]
            for r in pagerank_ppb(df, iters=iters).collect()}


class TestPagerankPpb:
    def test_symmetric_pair_is_the_exact_fixed_point(self, spark):
        # a<->b: each node's inflow is 85% of the other's rank, teleport
        # covers the rest; the uniform start IS the fixed point, exactly
        got = _ranks(spark, [("a", "b"), ("b", "a")])
        assert got == {"a": PR_TOTAL_PPB // 2, "b": PR_TOTAL_PPB // 2}

    def test_hub_outranks_spokes(self, spark):
        spokes = [f"s{i}" for i in range(4)]
        edges = [("h", s) for s in spokes] + [(s, "h") for s in spokes]
        got = _ranks(spark, edges)
        assert all(got["h"] > got[s] for s in spokes)
        # spokes are symmetric -> identical ranks
        assert len({got[s] for s in spokes}) == 1

    def test_mass_conserved_up_to_floor_loss(self, spark):
        # symmetric graph: every node has outflow, so total mass shrinks
        # only by integer-division floors — strictly bounded by one unit
        # per division per iteration (nodes teleports + edges contribs)
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
                 ("c", "d"), ("d", "c"), ("d", "a"), ("a", "d")]
        got = _ranks(spark, edges, iters=3)
        total = sum(got.values())
        n_nodes, n_edges, iters = 4, len(edges), 3
        assert total <= PR_TOTAL_PPB
        assert total >= PR_TOTAL_PPB - (n_nodes + n_edges) * iters - n_nodes

    def test_sink_only_node_keeps_teleport_share(self, spark):
        # 'z' has no outedges: it still receives teleport + inflow, and the
        # graph total drops by z's undistributed mass (documented semantics)
        got = _ranks(spark, [("a", "z"), ("z2", "a")], iters=1)
        assert set(got) == {"a", "z", "z2"}
        assert got["z"] > 0


class TestTriangleCensus:
    """triangle_census vs hand-computed graphs: exact counts on known
    topologies, the wedge fold, the zero-wedge branch, and the
    canonical-orientation exactly-once property."""

    @staticmethod
    def _census(spark, edges):
        from fictional_guacamole_spark.functions.graph import (
            triangle_census)
        df = spark.createDataFrame(edges, "i long, j long")
        return triangle_census(df).first()

    def test_single_triangle(self, spark):
        r = self._census(spark, [(1, 2), (2, 3), (1, 3)])
        assert (r["n_nodes"], r["n_edges"]) == (3, 3)
        assert (r["n_wedges"], r["n_triangles"]) == (3, 1)
        assert r["global_clustering"] == 1.0

    def test_k4_complete_graph(self, spark):
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        r = self._census(spark, edges)
        # K4: C(4,3)=4 triangles, each node deg 3 -> 4*C(3,2)=12 wedges
        assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (6, 12, 4)
        assert r["global_clustering"] == 1.0

    def test_path_graph_has_wedges_but_no_triangles(self, spark):
        r = self._census(spark, [(1, 2), (2, 3), (3, 4)])
        assert r["n_triangles"] == 0
        assert r["n_wedges"] == 2 and r["global_clustering"] == 0.0

    def test_star_graph_zero_clustering(self, spark):
        r = self._census(spark, [(1, h) for h in range(2, 8)])
        assert r["n_triangles"] == 0 and r["n_wedges"] == 15

    def test_single_edge_zero_wedges_branch(self, spark):
        r = self._census(spark, [(1, 2)])
        assert (r["n_wedges"], r["n_triangles"]) == (0, 0)
        assert r["global_clustering"] == 0.0

    def test_two_sharing_triangles_count_separately(self, spark):
        # bowtie minus center-split: triangles {1,2,3} and {1,4,5}
        r = self._census(spark, [(1, 2), (2, 3), (1, 3),
                                 (1, 4), (4, 5), (1, 5)])
        assert r["n_triangles"] == 2

    def test_matches_networkx_free_reference(self, spark):
        """A pseudo-random 25-node graph vs a pure-Python brute force
        (independent of the join scheme)."""
        import hashlib
        import itertools

        nodes = list(range(25))
        edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
                 if int(hashlib.md5(f"{a}-{b}".encode())
                        .hexdigest(), 16) % 3 == 0]
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        want_tri = sum(1 for a, b, c in itertools.combinations(nodes, 3)
                       if b in adj[a] and c in adj[a] and c in adj[b])
        want_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        r = self._census(spark, edges)
        assert r["n_triangles"] == want_tri
        assert r["n_wedges"] == want_wedges


class TestDegreeOrientation:
    """orient_by_degree (the compact-forward skew fix, VERDICT r8 task #3):
    census invariance under re-orientation and the fan-out bound on a
    hub-skewed graph where one node sits on >=50% of all edges."""

    @staticmethod
    def _hub_skewed_edges():
        """Star hub 0 -> 1..160 (160 edges) + a leaf path with chords
        (109 edges): hub degree 160 of 269 edges (>=50%), plus real
        triangles both through and away from the hub."""
        edges = [(0, leaf) for leaf in range(1, 161)]
        edges += [(leaf, leaf + 1) for leaf in range(1, 96)]
        edges += [(leaf, leaf + 2) for leaf in range(1, 94, 7)]
        return edges

    @staticmethod
    def _py_census(edges):
        import itertools

        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
                  if b in adj[a] and c in adj[a] and c in adj[b])
        wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        return len(adj), len(edges), wedges, tri

    def test_census_invariant_and_fanout_bounded_on_hub_skew(self, spark):
        from pyspark.sql import functions as F

        from fictional_guacamole_spark.functions.graph import (
            orient_by_degree, triangle_census)

        edges = self._hub_skewed_edges()
        n_nodes, n_edges, wedges, tri = self._py_census(edges)
        assert max(sum(1 for e in edges if 0 in e) for _ in [0]) * 2 \
            >= n_edges, "fixture must keep the hub on >=50% of edges"

        df = spark.createDataFrame(edges, "i long, j long")
        oriented = orient_by_degree(df)

        by_id = triangle_census(df).first()
        by_deg = triangle_census(oriented).first()
        assert tuple(by_id) == tuple(by_deg)  # orientation-invariant
        assert (by_deg["n_nodes"], by_deg["n_edges"],
                by_deg["n_wedges"], by_deg["n_triangles"]) == (
            n_nodes, n_edges, wedges, tri)

        # the wedge join keys on the edge's SOURCE: its per-key fan-out
        # is the out-degree. id orientation leaves the hub (id 0) with
        # out-degree 120; degree orientation points every hub edge INTO
        # the hub, collapsing the max fan-out below sqrt(2|E|).
        def max_outdeg(e):
            return (e.groupBy("i").agg(F.count(F.lit(1)).alias("od"))
                    .agg(F.max("od")).first()[0])

        id_fanout, deg_fanout = max_outdeg(df), max_outdeg(oriented)
        assert id_fanout == 160
        assert deg_fanout < (2 * n_edges) ** 0.5 + 1
        assert deg_fanout < id_fanout

    def test_orientation_output_is_a_valid_total_order(self, spark):
        """Every output edge must point strictly forward in (degree, id):
        re-orienting an already degree-oriented list is a no-op."""
        from fictional_guacamole_spark.functions.graph import (
            orient_by_degree)

        df = spark.createDataFrame(self._hub_skewed_edges(),
                                   "i long, j long")
        once = orient_by_degree(df)
        twice = orient_by_degree(once)
        got_once = sorted(map(tuple, once.collect()))
        got_twice = sorted(map(tuple, twice.collect()))
        assert got_once == got_twice
        assert len(got_once) == len(set(got_once))


class TestKcore:
    @pytest.fixture(scope="class")
    def edges(self, spark):
        from fictional_guacamole_spark.plans.graph import _cosupp_edges
        return [(r["i"], r["j"]) for r in
                _cosupp_edges(spark, "/root/testdata/sf0.001").collect()]

    def test_matches_pure_python_peel_to_fixpoint(self, spark, edges):
        # brute-force reference: peel to FIXPOINT (not 8 rounds) — if the
        # bounded unroll equals it, the fixture converged inside 8 rounds
        # and the judged output is the true 3-core
        from fictional_guacamole_spark.plans import REGISTRY
        adj = {}
        for i, j in edges:
            adj.setdefault(i, set()).add(j)
            adj.setdefault(j, set()).add(i)
        alive = set(adj)
        while True:
            drop = {n for n in alive
                    if len(adj[n] & alive) < 3}
            if not drop:
                break
            alive -= drop
        rows = REGISTRY["graph_kcore_membership"].builder(
            spark, "/root/testdata/sf0.001").collect()
        got_core = {r["node"] for r in rows if r["in_core"]}
        assert got_core == alive
        for r in rows:
            if r["in_core"]:
                assert r["core_degree"] == len(adj[r["node"]] & alive)
                assert r["core_degree"] >= 3
            else:
                assert r["core_degree"] == 0
        assert {r["node"] for r in rows} == set(adj)

    def test_kcore_on_hand_built_graph(self, spark):
        from fictional_guacamole_spark.functions.graph import kcore
        from pyspark.sql import functions as F  # noqa: F401
        # a 4-clique (core) + a tail of degree-1/2 nodes (peeled), where
        # peeling CASCADES: 10-11-12 chain dies over multiple rounds
        E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(E, "i long, j long")
        rows = {r["node"]: (r["in_core"], r["core_degree"])
                for r in kcore(df, k=3, rounds=8).collect()}
        assert rows[1] == (True, 3) and rows[2] == (True, 3)
        assert rows[3] == (True, 3) and rows[4] == (True, 3)
        for n in (10, 11, 12):
            assert rows[n] == (False, 0)

    def test_convergence_flag_trips_when_rounds_insufficient(self, spark):
        # r10 verdict task #6: a fixture where the 8-round budget is NOT
        # enough — a 30-node path under k=2 peels exactly its two
        # endpoints per round (15 rounds to empty), so after 8 rounds
        # peeling is still in progress and the bounded unroll returns a
        # SUPERSET of the true 2-core (which is empty). The flag must
        # say so.
        from fictional_guacamole_spark.functions.graph import kcore
        E = [(n, n + 1) for n in range(1, 30)]
        df = spark.createDataFrame(E, "i long, j long")
        conv: dict = {}
        rows = kcore(df, k=2, rounds=8, convergence_out=conv).collect()
        assert conv["converged"] is False
        assert conv["rounds_run"] == 8
        # unconverged output is a strict superset of the (empty) 2-core
        assert any(r["in_core"] for r in rows)

    def test_convergence_flag_and_early_exit_on_converged_graph(self, spark):
        # the clique+tail graph reaches fixpoint in 3 peel rounds (+1
        # no-op round that detects it); the result must be bit-identical
        # to the full 8-round unroll and the flag must report converged
        from fictional_guacamole_spark.functions.graph import kcore
        E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(E, "i long, j long")
        conv: dict = {}
        rows = {r["node"]: (r["in_core"], r["core_degree"])
                for r in kcore(df, k=3, rounds=8,
                               convergence_out=conv).collect()}
        assert conv["converged"] is True
        assert conv["rounds_run"] < 8  # early exit actually fired
        assert rows[1] == (True, 3) and rows[4] == (True, 3)
        for n in (10, 11, 12):
            assert rows[n] == (False, 0)

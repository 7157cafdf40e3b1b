"""Unit tests for the graph family (functions/graph.py): PageRank's exact
integer arithmetic on graphs whose fixed points are computable by hand, plus
mass-conservation bounds — the oracle-parity test covers the fixture path.
"""

from __future__ import annotations

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

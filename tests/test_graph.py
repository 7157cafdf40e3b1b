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

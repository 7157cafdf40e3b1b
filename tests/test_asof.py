"""Property tests for the generic as-of join (operators/asof.py): the
union+window distributed formulation must agree with a naive per-row
python as-of on random keyed time series, across strict/non-strict modes,
ties, and keys missing from either side."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fictional_guacamole_spark.operators.asof import asof_join

left_rows = st.lists(
    st.tuples(st.integers(1, 3),          # key
              st.integers(0, 20),         # time
              st.integers(0, 99)),        # payload
    min_size=1, max_size=25)
right_rows = st.lists(
    st.tuples(st.integers(1, 3),
              st.integers(0, 20),
              st.integers(100, 199)),     # value
    min_size=0, max_size=25)


def naive_asof(left, right, strict):
    out = {}
    for i, (lk, lt, lp) in enumerate(left):
        best = None
        for rk, rt, rv in right:
            if rk != lk:
                continue
            if (rt < lt) if strict else (rt <= lt):
                # most recent; tie on time → max value wins (tiebreak col)
                if best is None or (rt, rv) > best:
                    best = (rt, rv)
        out[i] = best[1] if best else None
    return out


@settings(max_examples=20, deadline=None)
@given(left=left_rows, right=right_rows, strict=st.booleans())
def test_asof_join_matches_naive(spark, left, right, strict):
    ldf = spark.createDataFrame(
        [(k, t, p, i) for i, (k, t, p) in enumerate(left)],
        "k long, t long, payload long, row_id long")
    rdf = spark.createDataFrame(right, "k long, t long, val long") \
        if right else spark.createDataFrame([], "k long, t long, val long")
    joined = asof_join(ldf, rdf, on="k", left_time="t", right_time="t",
                       value_cols=["val"], strict=strict, tiebreak="val")
    got = {r["row_id"]: r["val"] for r in joined.collect()}
    assert got == naive_asof(left, right, strict)


class TestAsofForward:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10), (1, 20), (1, 30), (2, 5)], "k long, t long")
        right = spark.createDataFrame(
            [(1, 10, "a"), (1, 25, "b"), (2, 99, "z")],
            "k long, rt long, v string")
        return left, right

    def test_forward_strict_picks_next_later(self, spark):
        from fictional_guacamole_spark.operators.asof import asof_join
        left, right = self._frames(spark)
        got = {(r.k, r.t): r.v for r in asof_join(
            left, right, "k", "t", "rt", ["v"],
            direction="forward").collect()}
        # strict: rt > t, so the rt=10 row does NOT serve t=10
        assert got == {(1, 10): "b", (1, 20): "b", (1, 30): None,
                       (2, 5): "z"}

    def test_forward_nonstrict_includes_equal_time(self, spark):
        from fictional_guacamole_spark.operators.asof import asof_join
        left, right = self._frames(spark)
        got = {(r.k, r.t): r.v for r in asof_join(
            left, right, "k", "t", "rt", ["v"], strict=False,
            direction="forward").collect()}
        assert got[(1, 10)] == "a"  # equal time now visible

    def test_bad_direction_rejected(self, spark):
        from fictional_guacamole_spark.operators.asof import asof_join
        left, right = self._frames(spark)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="backward|forward"):
            asof_join(left, right, "k", "t", "rt", ["v"],
                      direction="sideways")


class TestAsofNearest:
    def test_nearest_picks_closer_side_backward_ties(self, spark):
        from fictional_guacamole_spark.operators.asof import asof_join
        left = spark.createDataFrame(
            [(1, 10), (1, 14), (1, 100), (2, 7)], "k long, t long")
        right = spark.createDataFrame(
            [(1, 8, "early"), (1, 18, "late"), (2, 3, "only")],
            "k long, rt long, v string")
        got = {(r.k, r.t): r.v for r in asof_join(
            left, right, "k", "t", "rt", ["v"],
            direction="nearest").collect()}
        assert got == {
            (1, 10): "early",   # |10-8|=2 < |10-18|=8
            (1, 14): "late",    # |14-8|=6 > |14-18|=4
            (1, 100): "late",   # only backward candidates beyond 18
            (2, 7): "only",     # forward side empty -> backward wins
        }

    def test_nearest_tie_prefers_backward(self, spark):
        from fictional_guacamole_spark.operators.asof import asof_join
        left = spark.createDataFrame([(1, 10)], "k long, t long")
        right = spark.createDataFrame(
            [(1, 8, "b"), (1, 12, "f")], "k long, rt long, v string")
        got = asof_join(left, right, "k", "t", "rt", ["v"],
                        direction="nearest").collect()
        assert got[0].v == "b"  # equidistant: backward convention

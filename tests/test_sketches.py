"""Distinct-count sketch tests (functions/sketches.py): the KMV and HLL
estimators verified against a PURE-PYTHON reference implementation of the
published algorithms (hashlib md5 — independent of the Spark expression
path), their merge laws, accuracy bounds, the degenerate/small-range
branches, and plan-quality gates (JVM-only expressions, no global sort)."""

from __future__ import annotations

import hashlib
import math

import pytest

from fictional_guacamole_spark.functions import sketches as SK


def _py_hash60(value) -> int:
    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


def _py_hll_registers(values, p=SK.HLL_P):
    wb = 60 - p
    regs = {}
    for v in set(values):
        h = _py_hash60(v)
        bucket, w = h >> wb, h & ((1 << wb) - 1)
        rho = wb + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _df_of(spark, values):
    return spark.createDataFrame([(v,) for v in values], "event_id long")


class TestHash:
    def test_hash60_matches_hashlib(self, spark):
        vals = [0, 1, 42, 10**12, -7]
        got = {r["event_id"]: r["h"]
               for r in _df_of(spark, vals)
               .select("event_id", SK.hash60(
                   __import__("pyspark.sql.functions", fromlist=["col"])
                   .col("event_id")).alias("h")).collect()}
        for v in vals:
            assert got[v] == _py_hash60(v), v


class TestKmv:
    def test_estimate_matches_python_reference(self, spark):
        values = list(range(5000))
        k = 64
        hashes = sorted({_py_hash60(v) for v in values})
        hk = hashes[k - 1]
        want = (k - 1) * float(1 << 60) / float(hk)
        row = SK.kmv_estimate(_df_of(spark, values), "event_id", k).first()
        assert row["kth_hash"] == hk
        assert row["est_distinct"] == want
        assert row["exact_distinct"] == 5000
        # KMV standard error is ~1/sqrt(k-2): allow 4 sigma
        assert abs(row["est_distinct"] - 5000) / 5000 < 4 / math.sqrt(k - 2)

    def test_duplicates_do_not_move_the_estimate(self, spark):
        base = list(range(700))
        row1 = SK.kmv_estimate(_df_of(spark, base), "event_id", 32).first()
        row2 = SK.kmv_estimate(_df_of(spark, base * 3), "event_id",
                               32).first()
        assert row1["kth_hash"] == row2["kth_hash"]
        assert row1["est_distinct"] == row2["est_distinct"]

    def test_degenerate_fewer_than_k_is_exact(self, spark):
        row = SK.kmv_estimate(_df_of(spark, list(range(10))), "event_id",
                              64).first()
        assert row["n_in_sketch"] == 10
        assert row["est_distinct"] == 10.0 and row["exact_distinct"] == 10

    def test_merge_law_union_of_sketches(self, spark):
        """KMV merges by union + re-take: the k smallest of the union of
        two sketches equal the sketch of the concatenated corpus."""
        a, b = list(range(0, 900)), list(range(600, 1500))
        k = 48
        sk_a = [r["h"] for r in
                SK.kmv_sketch(_df_of(spark, a), "event_id", k).collect()]
        sk_b = [r["h"] for r in
                SK.kmv_sketch(_df_of(spark, b), "event_id", k).collect()]
        merged = sorted(set(sk_a) | set(sk_b))[:k]
        whole = [r["h"] for r in
                 SK.kmv_sketch(_df_of(spark, a + b), "event_id",
                               k).collect()]
        assert merged == sorted(whole)

    def test_plan_has_partial_topk_not_global_sort(self, spark):
        df = SK.kmv_sketch(_df_of(spark, list(range(100))), "event_id", 16)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan


class TestHll:
    def test_registers_match_python_reference(self, spark):
        values = list(range(3000))
        got = {r["bucket"]: r["M"]
               for r in SK.hll_registers(_df_of(spark, values),
                                         "event_id").collect()}
        assert got == _py_hll_registers(values)

    def test_estimate_matches_python_reference_exactly(self, spark):
        values = list(range(4000))
        regs = _py_hll_registers(values)
        denom = sum(1 << (SK._HLL_SCALE_BITS - regs.get(j, 0))
                    for j in range(SK.HLL_M))
        want = SK._HLL_NUMERATOR / float(denom)
        row = SK.hll_estimate(_df_of(spark, values), "event_id").first()
        assert row["harmonic_denom"] == denom
        assert row["occupied"] == len(regs)
        assert row["est_distinct"] == want
        # HLL standard error ~1.04/sqrt(m): allow 4 sigma
        assert abs(want - 4000) / 4000 < 4 * 1.04 / math.sqrt(SK.HLL_M)

    def test_merge_law_registerwise_max(self, spark):
        a, b = list(range(0, 1200)), list(range(800, 2400))
        ra = _py_hll_registers(a)
        rb = _py_hll_registers(b)
        merged = {j: max(ra.get(j, 0), rb.get(j, 0))
                  for j in set(ra) | set(rb)}
        got = {r["bucket"]: r["M"]
               for r in SK.hll_registers(_df_of(spark, a + b),
                                         "event_id").collect()}
        assert got == merged

    def test_small_range_linear_counting_branch(self, spark):
        """A tiny corpus lands in the E <= 2.5m small-range regime with
        empty buckets; the estimate must be m * ln(m / V)."""
        values = list(range(20))
        row = SK.hll_estimate(_df_of(spark, values), "event_id").first()
        v = SK.HLL_M - row["occupied"]
        assert v > 0
        want = SK.HLL_M * math.log(SK.HLL_M / v)
        assert row["est_distinct"] == pytest.approx(want, rel=1e-12)

    def test_plan_is_jvm_only_single_shuffle(self, spark):
        df = SK.hll_estimate(_df_of(spark, list(range(500))), "event_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestKmvSetOps:
    def _py_set_ops(self, a, b, k):
        sa = sorted({_py_hash60(v) for v in set(a)})[:k]
        sb = sorted({_py_hash60(v) for v in set(b)})[:k]
        un = sorted(set(sa) | set(sb))[:k]
        n, hk = len(un), max(un)
        rho = sum(1 for h in set(sa) & set(sb) if h <= hk)
        if n < k:
            u_est, i_est = float(n), float(rho)
        else:
            u_est = (k - 1) * float(1 << 60) / float(hk)
            i_est = rho / float(k) * u_est
        return n, rho, u_est, i_est, rho / float(n)

    def test_matches_python_reference_with_overlap(self, spark):
        a, b = list(range(0, 1200)), list(range(800, 2000))
        k = 64
        n, rho, u_est, i_est, j_est = self._py_set_ops(a, b, k)
        row = SK.kmv_set_ops(_df_of(spark, a), _df_of(spark, b),
                             "event_id", k).first()
        assert (row["n_union_sketch"], row["rho"]) == (n, rho)
        assert row["union_est"] == u_est
        assert row["inter_est"] == i_est
        assert row["jaccard_est"] == j_est
        assert row["exact_union"] == 2000 and row["exact_inter"] == 400
        # sanity: estimates land near truth
        assert abs(u_est - 2000) / 2000 < 4 / math.sqrt(k - 2)
        assert abs(j_est - 0.2) < 0.15

    def test_degenerate_small_sets_are_exact(self, spark):
        a, b = list(range(0, 30)), list(range(20, 50))
        row = SK.kmv_set_ops(_df_of(spark, a), _df_of(spark, b),
                             "event_id", 64).first()
        assert row["n_union_sketch"] == 50
        assert row["union_est"] == 50.0 and row["exact_union"] == 50
        assert row["inter_est"] == 10.0 and row["exact_inter"] == 10

    def test_disjoint_sets_estimate_zero_intersection(self, spark):
        a, b = list(range(0, 1000)), list(range(5000, 6000))
        row = SK.kmv_set_ops(_df_of(spark, a), _df_of(spark, b),
                             "event_id", 48).first()
        # overlap in hash space below threshold is possible but the md5
        # hash makes collisions across disjoint ids vanishingly unlikely
        assert row["rho"] == 0 and row["inter_est"] == 0.0
        assert row["exact_inter"] == 0

    def test_empty_pair_degenerate_guard_matches_oracle(self, spark):
        """r8 advisor finding: jaccard_est on an EMPTY pair of inputs
        (n_union_sketch = 0) must be 0.0 in both engines — Spark's
        non-ANSI Divide returned NULL while DuckDB's IEEE division
        returned NaN before the shared degenerate branch was added."""
        import duckdb

        row = SK.kmv_set_ops(_df_of(spark, []), _df_of(spark, []),
                             "event_id", 16).first()
        assert row["jaccard_est"] == 0.0
        assert row["union_est"] == 0.0 and row["inter_est"] == 0.0
        assert row["n_union_sketch"] == 0 and row["rho"] == 0
        assert row["exact_union"] == 0 and row["exact_inter"] == 0

        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT CAST(1 AS BIGINT) AS event_id")
        orow = con.execute(
            SK.sql_kmv_set_ops("t", "event_id", "FALSE", "FALSE", 16)
        ).fetchone()
        got = (row["k"], row["n_union_sketch"], row["rho"],
               row["union_est"], row["inter_est"], row["jaccard_est"],
               row["exact_union"], row["exact_inter"])
        assert tuple(orow) == got

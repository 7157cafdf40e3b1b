"""Unit + property tests for the time-series operator family
(functions/timeseries.py): gap-fill/LOCF on crafted grids with known
holes, and the exact-arithmetic EWMA closed form checked against an exact
rational-number fold — the oracle-parity tests cover the fixture path;
these cover the edges the fixture can't reach (leading runs of gaps, a
single-row key, horizon truncation, arbitrary 2-decimal values)."""

from __future__ import annotations

import datetime as dt
import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import timeseries as T

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(minute_offsets_by_key):
    """rows (key, ts, value) with value = 1.0 * minute offset."""
    return [(k, T0 + dt.timedelta(minutes=m), float(m))
            for k, ms in minute_offsets_by_key.items() for m in ms]


class TestGapfillLocf:
    def _run(self, spark, rows, bucket="15 minutes"):
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = T.gapfill_locf(df, "k", "ts",
                             {"max_v": F.max("v")}, bucket=bucket)
        return {(r["k"], r["bucket"]): r for r in out.collect()}

    def test_holes_filled_with_last_observation(self, spark):
        # key a: events in buckets 0 and 3 (minutes 0-14 and 45-59);
        # buckets 1 and 2 are holes and must carry bucket 0's aggregate
        got = self._run(spark, _ev({"a": [0, 50]}))
        assert len(got) == 4
        b = lambda i: T0 + dt.timedelta(minutes=15 * i)
        assert got[("a", b(0))]["max_v"] == 0.0
        assert got[("a", b(1))]["max_v"] == 0.0  # LOCF
        assert got[("a", b(1))]["is_gap"] is True
        assert got[("a", b(1))]["n_events"] == 0
        assert got[("a", b(2))]["max_v"] == 0.0  # LOCF across a RUN of gaps
        assert got[("a", b(3))]["max_v"] == 50.0
        assert got[("a", b(3))]["is_gap"] is False

    def test_grid_is_per_key_and_complete(self, spark):
        # key spans differ; each key's grid runs min..max bucket inclusive
        got = self._run(spark, _ev({"a": [0, 70], "b": [30]}))
        a_buckets = sorted(bk for k, bk in got if k == "a")
        b_buckets = sorted(bk for k, bk in got if k == "b")
        assert len(a_buckets) == 5  # buckets 0..4 (minute 70)
        assert a_buckets[0] == T0
        assert b_buckets == [T0 + dt.timedelta(minutes=30)]  # single bucket

    def test_first_bucket_never_null(self, spark):
        got = self._run(spark, _ev({"a": [7]}))
        (row,) = got.values()
        assert row["max_v"] == 7.0 and row["is_gap"] is False


class TestEwmaPow2:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double")
        out = T.ewma_pow2(df, "user_id", ["ts", "event_id"], "value")
        return {r["user_id"]: r for r in out.collect()}

    @staticmethod
    def _ref(cents):
        """Exact rational EWMA fold over the last EWMA_HORIZON values."""
        kept = cents[-T.EWMA_HORIZON:]
        e = Fraction(kept[0], T.EWMA_VALUE_SCALE)
        for c in kept[1:]:
            e = (Fraction(c, T.EWMA_VALUE_SCALE) + e) / 2
        return float(e)  # single correct rounding of the true rational

    @staticmethod
    def _eff_cents(value):
        """The operator's quantization: floor(value*100) in IEEE doubles.
        NOT always round(value*100) — e.g. 0.29*100 = 28.999... → 28; the
        reference fold must mirror the same quantization bit-for-bit."""
        import math
        return math.floor(value * 100)

    def test_single_event_is_identity(self, spark):
        got = self._run(spark, [(1, T0, 1, 12.34)])
        assert got[1]["n_used"] == 1
        assert got[1]["ewma"] == self._eff_cents(12.34) / 100.0

    def test_matches_exact_rational_fold(self, spark):
        cents = [100, 300, 500, 200]  # 1.00, 3.00, 5.00, 2.00 in order
        rows = [(7, T0 + dt.timedelta(seconds=i), i, c / 100.0)
                for i, c in enumerate(cents)]
        got = self._run(spark, rows)
        assert got[7]["n_used"] == len(cents)
        assert got[7]["ewma"] == self._ref(cents)

    def test_horizon_truncates_old_rows(self, spark):
        # 20 events; only the last 16 may influence the result
        cents = [100] * 4 + [200] * 16
        rows = [(3, T0 + dt.timedelta(seconds=i), i, c / 100.0)
                for i, c in enumerate(cents)]
        got = self._run(spark, rows)
        assert got[3]["n_used"] == T.EWMA_HORIZON
        assert got[3]["ewma"] == 2.0  # constant over the kept window

    def test_tie_on_ts_breaks_by_event_id(self, spark):
        # same timestamp, different event_id: higher event_id is newer
        rows = [(5, T0, 1, 1.00), (5, T0, 2, 9.00)]
        got = self._run(spark, rows)
        assert got[5]["ewma"] == self._ref([100, 900])

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=50000),
                    min_size=1, max_size=24))
    def test_property_matches_rational_fold(self, spark, cents):
        rows = [(11, T0 + dt.timedelta(seconds=i), i, c / 100.0)
                for i, c in enumerate(cents)]
        got = self._run(spark, rows)
        eff = [self._eff_cents(c / 100.0) for c in cents]
        assert got[11]["ewma"] == self._ref(eff)
        assert got[11]["n_used"] == min(len(cents), T.EWMA_HORIZON)


class TestSubsequenceMatch:
    def test_planted_exact_match_wins(self, spark):
        from fictional_guacamole_spark.functions.timeseries import (
            subsequence_topk)
        from pyspark.sql import functions as F

        # key 1 carries the pattern verbatim at positions 10..13; key 2
        # carries noise. The planted window must rank first with dist2=0.
        pat_vals = [1.00, 2.00, 3.00, 4.00]
        rows = []
        for i in range(10):
            rows.append((1, i, float(50 + i)))
            rows.append((2, i, float(90 - i)))
        for j, v in enumerate(pat_vals):
            rows.append((1, 10 + j, v))
            rows.append((2, 10 + j, v + 7.0))
        df = spark.createDataFrame(rows, "k long, ts long, value double")
        pattern = spark.createDataFrame(
            [([int(v * 100) for v in pat_vals],)], "pattern array<long>")
        top = subsequence_topk(df, "k", "ts", "value", pattern,
                               length=4, k=1).collect()
        assert len(top) == 1
        assert (top[0].k, top[0].window_end, top[0].dist2) == (1, 13, 0)


class TestResampleLinear:
    def _run(self, spark, rows, step=30):
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = T.resample_linear(df, "k", "ts", "v", step_minutes=step)
        return {(r["k"], r["grid_ts"]): r["value_c"] for r in out.collect()}

    def test_midpoint_and_endpoints_exact(self, spark):
        # obs at minute 0 (10.00) and minute 60 (20.00), 30-min grid:
        # grid point 30 is the exact midpoint -> 15.00
        got = self._run(spark, _ev({"a": []}) + [
            ("a", T0, 10.0), ("a", T0 + dt.timedelta(minutes=60), 20.0)])
        m = lambda i: T0 + dt.timedelta(minutes=i)
        assert got == {("a", m(0)): 1000, ("a", m(30)): 1500,
                       ("a", m(60)): 2000}

    def test_truncating_division(self, spark):
        # obs 0.00@0min and 1.00@45min; grid point 30 -> 100*30/45 =
        # 66.67 cents, floored to 66 (the documented DIV semantics)
        got = self._run(spark, [
            ("a", T0, 0.0), ("a", T0 + dt.timedelta(minutes=45), 1.0)])
        assert got[("a", T0 + dt.timedelta(minutes=30))] == 66

    def test_observation_on_grid_point_is_exact(self, spark):
        # an obs exactly on the lattice wins regardless of neighbors
        got = self._run(spark, [
            ("a", T0, 10.0),
            ("a", T0 + dt.timedelta(minutes=30), 77.77),
            ("a", T0 + dt.timedelta(minutes=60), 20.0)])
        assert got[("a", T0 + dt.timedelta(minutes=30))] == 7777

    def test_key_with_no_interior_grid_point_is_absent(self, spark):
        # span (7..22 min) brackets no 30-min lattice point -> no output
        # rows for that key, and no crash from an empty sequence()
        got = self._run(spark, [
            ("a", T0 + dt.timedelta(minutes=7), 1.0),
            ("a", T0 + dt.timedelta(minutes=22), 2.0),
            ("b", T0, 5.0), ("b", T0 + dt.timedelta(minutes=30), 6.0)])
        assert {k for k, _ in got} == {"b"}

    @settings(max_examples=15, deadline=None)
    @given(st.dictionaries(
        st.integers(min_value=0, max_value=240),
        st.integers(min_value=0, max_value=9999), min_size=2, max_size=12))
    def test_matches_rational_oracle(self, spark, obs):
        # floor(exact rational lerp) computed with Fractions must equal the
        # engine's integer DIV result at every grid point
        rows = [("a", T0 + dt.timedelta(minutes=m), v / 100.0)
                for m, v in obs.items()]
        got = self._run(spark, rows)
        # replicate the engines' cent extraction: FLOOR(double * 100) on
        # the round-tripped double (72.21 * 100 == 7220.999... -> 7220)
        pts = sorted((m * 60_000_000, math.floor((v / 100.0) * 100))
                     for m, v in obs.items())
        lo, hi = pts[0][0], pts[-1][0]
        step = 30 * 60_000_000
        t = ((lo + step - 1) // step) * step
        expect = {}
        while t <= hi:
            prev = max(p for p in pts if p[0] <= t)
            nxt = min(p for p in pts if p[0] >= t and (p[0] > t or p == prev))
            nxt = min((p for p in pts if p[0] > t), default=prev) \
                if prev[0] == t else nxt
            if prev[0] == t:
                expect[t] = prev[1]
            else:
                f = Fraction(prev[1] * (nxt[0] - t) + nxt[1] * (t - prev[0]),
                             nxt[0] - prev[0])
                expect[t] = f.numerator // f.denominator
            t += step
        base_us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()
                      ) * 1_000_000
        got_by_us = {
            int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            - base_us: v
            for (_, ts), v in got.items()}
        assert got_by_us == expect


class TestAnomalyZscore:
    def _run(self, spark, vals, z=3):
        rows = [("u", i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, i long, v double")
        out = T.anomaly_zscore(df, "k", ["i"], "v", z=z)
        return sorted(r["i"] for r in out.collect())

    def test_spike_after_constant_baseline_flagged(self, spark):
        # 16 identical observations -> zero variance; the 17th row deviates
        # -> flagged; nothing earlier has a full window so nothing else is
        assert self._run(spark, [5.0] * 16 + [50.0]) == [16]

    def test_any_deviation_from_zero_variance_flagged(self, spark):
        # exactness semantics: with var == 0 even a one-cent deviation has
        # dev2 > 0 = z^2 * var -- the documented degenerate-window behavior
        assert self._run(spark, [5.0] * 16 + [5.01]) == [16]

    def test_threshold_algebra_on_noisy_baseline(self, spark):
        # alternating 4/6 baseline: n=16, s=8000, var_nn=2_560_000;
        # flag iff (16x-8000)^2 > 9*var_nn <=> x > 800 or x < 200 cents
        base = [4.0, 6.0] * 8
        assert self._run(spark, base + [9.0]) == [16]   # above the bound
        assert self._run(spark, base + [7.0]) == []     # inside the bound
        assert self._run(spark, base + [1.0]) == [16]   # below the bound

    def test_partial_window_rows_never_flagged(self, spark):
        # fewer than 16 trailing rows -> row not scored at all
        assert self._run(spark, [5.0] * 10 + [500.0]) == []

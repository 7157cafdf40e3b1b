"""Unit + property tests for the time-series operator family
(functions/timeseries.py): gap-fill/LOCF on crafted grids with known
holes, and the exact-arithmetic EWMA closed form checked against an exact
rational-number fold — the oracle-parity tests cover the fixture path;
these cover the edges the fixture can't reach (leading runs of gaps, a
single-row key, horizon truncation, arbitrary 2-decimal values)."""

from __future__ import annotations

import datetime as dt
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

"""Unit tests for the bucketized interval join operator: exact semantics
vs a naive range join, interval/bucket boundary cases, and the
multi-bucket explosion."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.operators.rangejoin import interval_join


def _ts(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s, tzinfo=timezone.utc)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [(i, _ts(h, m)) for i, (h, m) in enumerate(
            [(0, 0), (0, 59), (1, 0), (2, 30), (5, 0), (11, 59), (12, 0)])],
        ["pid", "ts"])
    intervals = spark.createDataFrame(
        [(100, _ts(0, 30), _ts(2, 30)),    # spans 3 hourly buckets
         (200, _ts(2, 30), _ts(2, 30)),    # zero-length (start == end)
         (300, _ts(11, 0), _ts(13, 0))],
        ["iid", "start", "end"])
    return points, intervals


class TestIntervalJoin:
    def test_matches_naive_range_join(self, spark, frames):
        points, intervals = frames
        got = {(r["pid"], r["iid"]) for r in
               interval_join(points, intervals, "ts", "start", "end",
                             bucket_seconds=3600).collect()}
        naive = {(r["pid"], r["iid"]) for r in
                 points.join(intervals,
                             (points.ts >= intervals.start)
                             & (points.ts <= intervals.end)).collect()}
        assert got == naive
        assert got  # non-trivial
        # boundary semantics: inclusive on both ends
        assert (3, 100) in got and (3, 200) in got  # 2:30 point
        assert (6, 300) in got                      # 12:00 inside 11-13

    @pytest.mark.parametrize("bucket_seconds", [60, 3600, 86400])
    def test_bucket_width_never_changes_semantics(self, spark, frames,
                                                  bucket_seconds):
        points, intervals = frames
        got = {(r["pid"], r["iid"]) for r in
               interval_join(points, intervals, "ts", "start", "end",
                             bucket_seconds=bucket_seconds).collect()}
        naive = {(r["pid"], r["iid"]) for r in
                 points.join(intervals,
                             (points.ts >= intervals.start)
                             & (points.ts <= intervals.end)).collect()}
        assert got == naive

    def test_no_duplicate_matches_across_buckets(self, spark, frames):
        # an interval spanning k buckets must still match a point once
        points, intervals = frames
        out = interval_join(points, intervals, "ts", "start", "end",
                            bucket_seconds=60)  # narrow: iid=100 spans 121
        pairs = [(r["pid"], r["iid"]) for r in out.collect()]
        assert len(pairs) == len(set(pairs))

    def test_outer_rejected(self, spark, frames):
        points, intervals = frames
        with pytest.raises(ValueError, match="inner"):
            interval_join(points, intervals, "ts", "start", "end",
                          how="left")

"""Bucketized interval (range) join.

A key-less range join — ``left.ts BETWEEN right.start AND right.end`` with
no equi column — executes as BroadcastNestedLoopJoin or CartesianProduct
on Spark: O(|L|·|R|) comparisons, dead at scale. The standard fix is to
discretize the time axis: every interval explodes to the buckets it
covers, every point maps to its bucket, and the join becomes a plain
equi-join on the bucket id with the exact range predicate as a residual
filter. Cost moves from |L|·|R| to Σ(bucket co-occupancy) — data-local,
shuffle-partitionable, AQE-skew-splittable like any other equi join.

Bucket width is the tuning knob: too narrow explodes long intervals into
many rows (storage/shuffle amplification = interval_len / width); too wide
puts unrelated rows in one bucket (residual-filter waste). Set it near the
median interval length. Spark's own storage-partitioned joins and
Delta/Iceberg partition layouts compose: partition the interval table by
bucket and the scan prunes to the probe's buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str, start_col: str, end_col: str,
                  bucket_seconds: int = 3600,
                  how: str = "inner") -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``), without a nested-loop join.

    ``points`` and ``intervals`` may share no key columns; ambiguous
    column names must be disambiguated by the caller beforehand. The
    output carries all columns of both inputs.

    Only ``inner`` is supported: the bucket explosion duplicates interval
    rows, so outer variants would need post-dedup of unmatched sides —
    compose with an anti join instead.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only; "
                         "compose with semi/anti joins for other shapes")
    b = F.lit(bucket_seconds)
    pt = F.col(point_ts).cast("long")
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")

    p = points.withColumn("__bucket", F.floor(pt / b))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(s / b), F.floor(e / b))))
    return (p.join(iv, "__bucket")
            .filter((F.col(point_ts) >= F.col(start_col))
                    & (F.col(point_ts) <= F.col(end_col)))
            .drop("__bucket"))


def point_bucket(ts: Column, bucket_seconds: int) -> Column:
    """Bucket id expression for pre-partitioning a point table so the
    interval probe prunes partitions at scan time."""
    return F.floor(ts.cast("long") / F.lit(bucket_seconds))

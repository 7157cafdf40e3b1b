"""Bucketed table layout: the shuffle-free fact⋈fact join at 100 TB.

A join between two large tables normally shuffles BOTH sides on the join
key every time it runs. Writing each table bucketed (hash-partitioned into
a fixed bucket count) and sorted by the key moves that shuffle to write
time, once: every subsequent join on the bucket key is a zipped
sort-merge of co-located buckets — zero Exchange in the plan. SCALE.md's
layout analysis calls this out as the fix for the orders⋈lineitem shuffle;
this module is the executable form, and tests/test_plan_quality.py gates
the no-Exchange plan shape.

Rules that make it work (all enforced here):
- both sides bucketed INTO THE SAME BUCKET COUNT on the join key
  (mismatched counts shuffle the smaller side);
- ``sortBy`` the key so the merge needs no per-bucket sort;
- bucket count chosen for target-scale task size: at 100 TB / 1000
  executors, thousands of buckets keeps each bucket in executor memory —
  the count is the parallelism floor for every downstream bucketed join;
- spark.sql.autoBroadcastJoinThreshold matters: Catalyst still prefers a
  broadcast when one side is tiny, which ALSO avoids the shuffle — the
  bucketed path is for when neither side broadcasts.

Bucketed tables are a metastore concept: ``saveAsTable`` (not ``save``)
records the bucket spec in the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Persist ``df`` hash-bucketed and sorted by ``key`` as a catalog
    table, the one-time shuffle that makes later joins on ``key``
    exchange-free. ``path`` makes it an EXTERNAL table (data at an
    explicit location instead of the session warehouse directory —
    bucket spec metadata still lives in the catalog, which is what
    Catalyst reads to elide the Exchange)."""
    w = (df.write.mode(mode)
         .bucketBy(n_buckets, key)
         .sortBy(key)
         .format("parquet"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucket-spec tables on their bucket key. Catalyst
    recognizes the matching output partitioning and plans a sort-merge
    join with no Exchange on either side (gated in
    tests/test_plan_quality.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

"""A custom Spark 4 Python DataSource over WebDataset-style tar shards.

PySpark 4's Python DataSource API (`pyspark.sql.datasource`, SPARK-44076)
is the sanctioned extension point for formats Spark has no native reader
for — the successor to wrapping everything in `binaryFile` + mapInPandas.
This source exposes the tar-shard layout written by
:mod:`fictional_guacamole_spark.sources.tar_shards` as a real
``spark.read.format("fg_tarshard")`` relation:

- ``partitions()`` (driver side) lists shard files and emits ONE
  InputPartition per shard — the reader's parallelism is the shard
  count, exactly like WebDataset's own loaders, and Spark schedules
  each shard to an executor as an independent task.
- ``read(partition)`` (executor side) streams members out of its one
  tar via stdlib tarfile, yielding plain tuples.

Scale notes: at 100 TB the shard paths must be on shared storage (the
API hands each executor only the path string); shard size is the task
memory bound. Local-mode tests exercise the identical code path.

Reference parity note: the reference app (real_guac.py / polo_ws.py)
reads websockets and SQLite only; this is part of the engine's
training-data source surface.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

TAR_MEMBER_SCHEMA = "member_id long, n_bytes long, text string"


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TarShardReader(DataSourceReader):
    def __init__(self, options):
        self.base = options["path"]

    def partitions(self):  # driver side: one task per shard
        import glob

        paths = sorted(glob.glob(os.path.join(self.base, "*.tar")))
        if not paths:
            raise FileNotFoundError(f"no *.tar shards under {self.base}")
        return [_ShardPartition(p) for p in paths]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        # executor side: stream one shard's members
        with open(partition.path, "rb") as fh:
            data = fh.read()
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            for info in tf:
                blob = tf.extractfile(info).read()
                yield (int(info.name.split(".")[0]), len(blob),
                       blob.decode("utf-8"))


class TarShardDataSource(DataSource):
    """``spark.read.format("fg_tarshard").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "fg_tarshard"

    def schema(self) -> str:
        return TAR_MEMBER_SCHEMA

    def reader(self, schema) -> TarShardReader:
        return TarShardReader(self.options)


def read_tar_shards_pyds(spark: SparkSession, base: str) -> DataFrame:
    """Register (idempotently) and read the tar shards through the
    Python DataSource API — one Spark task per shard."""
    spark.dataSource.register(TarShardDataSource)
    return spark.read.format("fg_tarshard").option("path", base).load()

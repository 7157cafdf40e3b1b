"""WebDataset-style tar-shard interchange (stdlib ``tarfile``).

The de-facto container for large-scale multimodal training corpora is a
set of POSIX tar shards, each holding one file per sample keyed by a
zero-padded id (WebDataset; Aizman et al. 2019, "High Performance I/O For
Large Scale Deep Learning"). This module writes and reads that layout
Spark-first:

- **write**: one ``applyInPandas`` group per shard — the group writes its
  members in sorted order to ``shard-{s:05d}.tar`` and returns a manifest
  row. Shard assignment is a pure hash/modulo of the sample id, so the
  write is a single hash shuffle; each task streams members sequentially
  (tar is an append-only format — no random access needed on write).
- **read**: ``binaryFile`` scan over ``*.tar`` (one task per shard, the
  same parallelism WebDataset's own loader uses) feeding ``mapInPandas``
  that re-yields one row per member via stdlib tarfile over an in-memory
  buffer.

Scale notes (100 TB): shard count is chosen so shards land at the
WebDataset-conventional 100 MB–1 GB — `binaryFile` materializes one whole
shard per row, so the shard size IS the task memory bound, exactly as in
the reference loaders. Determinism for the oracle: members are sorted by
id, and every tar header pins mtime=0/uid=0/gid=0/mode=0o644 so shard
bytes are a pure function of the data.

Reference parity note: the reference app (real_guac.py / polo_ws.py)
persists to SQLite only; tar shards are part of the training-data surface
this engine adds.
"""

from __future__ import annotations

import io
import os
import shutil
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard int, n_members long, data_bytes long"
MEMBER_SCHEMA = "member_id long, n_bytes long, text string"


def write_tar_shards(docs: DataFrame, base: str, n_shards: int,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """Write ``docs`` as ``n_shards`` deterministic tar shards under
    ``base`` (created atomically: private build dir, then rename).

    One shuffle (hash on ``shard``), one writer task per shard; each
    member is ``{id:012d}.txt`` with the UTF-8 text bytes.
    """
    if os.path.exists(base):
        return
    build = f"{base}.build.{os.getpid()}"
    os.makedirs(build, exist_ok=True)

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("sid")
        tmp = os.path.join(build, f".shard-{shard:05d}.tar.tmp")
        total = 0
        with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
            for sid, text in zip(pdf["sid"], pdf["txt"]):
                data = str(text).encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(sid):012d}.txt")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(data))
                total += len(data)
        os.rename(tmp, os.path.join(build, f"shard-{shard:05d}.tar"))
        return pd.DataFrame(
            {"shard": [shard], "n_members": [len(pdf)],
             "data_bytes": [total]})

    staged = docs.select(
        F.col(id_col).cast("long").alias("sid"),
        F.col(text_col).alias("txt"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"))
    # the count() action drives every shard writer; manifest rows are the
    # 1-row-per-task bookkeeping convention the other sinks use
    staged.groupBy("shard").applyInPandas(
        _write_shard, schema=MANIFEST_SCHEMA).count()
    try:
        os.rename(build, base)
    except OSError:  # concurrent builder published first; ours is moot
        shutil.rmtree(build, ignore_errors=True)


def read_tar_shards(spark: SparkSession, base: str) -> DataFrame:
    """One row per tar member across every shard under ``base``:
    (member_id from the member name, n_bytes, decoded text)."""
    shards = spark.read.format("binaryFile").load(os.path.join(base, "*.tar"))

    def _members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_n, out_t = [], [], []
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    for info in tf:
                        data = tf.extractfile(info).read()
                        out_id.append(int(info.name.split(".")[0]))
                        out_n.append(len(data))
                        out_t.append(data.decode("utf-8"))
            yield pd.DataFrame(
                {"member_id": out_id, "n_bytes": out_n, "text": out_t})

    return shards.select("content").mapInPandas(
        _members, schema=MEMBER_SCHEMA)

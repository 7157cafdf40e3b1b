"""File-replay frame source.

Replays captured exchange frames (one JSON text frame per line, in capture
order) as a rate-limited stream — the deterministic stand-in for the live
websocket sources (SURVEY.md §2.1 S1/S2) that every streaming test uses.
Implemented as a Spark 4 Python DataSource stream reader so the engine
exercises the same source contract a live connector would: offsets,
``read(start) -> (rows, next_offset)``, replay-on-restart recovery.

For plain batch/golden tests, ``read_frames_batch`` loads the same capture
files through the ordinary file source with an arrival-order ``seq``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

REPLAY_SCHEMA = "seq long, value string"


@dataclass
class _Offset:
    line: int

    def json(self) -> dict:
        return {"line": self.line}


class ReplayStreamReader(SimpleDataSourceStreamReader):
    """Reads ``frames_per_batch`` lines per micro-batch from a capture file.

    The offset is the absolute line number, so checkpoint recovery re-reads
    from exactly the committed position (at-least-once within a batch,
    exactly-once end-to-end with an idempotent sink).
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.frames_per_batch = int(options.get("framesPerBatch", "100"))

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict) -> tuple:
        start_line = start["line"]
        rows = []
        # The end offset advances by lines SCANNED, not rows emitted: a
        # blank line inside the window would otherwise be re-scanned (its
        # followers re-emitted = duplicate seq values), and a window of all
        # blanks would leave the offset pinned forever.
        last_scanned = start_line - 1
        with open(self.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i < start_line:
                    continue
                if i >= start_line + self.frames_per_batch:
                    break
                last_scanned = i
                line = line.strip()
                if line:
                    rows.append((i, line))
        return iter(rows), {"line": last_scanned + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> iter:
        rows = []
        with open(self.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if start["line"] <= i < end["line"]:
                    line = line.strip()
                    if line:
                        rows.append((i, line))
        return iter(rows)


class ReplayDataSource(DataSource):
    """``spark.readStream.format("frame_replay").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "frame_replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> ReplayStreamReader:
        return ReplayStreamReader(self.options)


def register(spark: SparkSession) -> None:
    # by-VALUE registration: the streaming source runner is a driver-side
    # python process without the addPyFile zip — a by-reference pickle
    # dies outside the repo cwd (see sources/pyds.py::_register_by_value)
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
    spark.dataSource.register(ReplayDataSource)


def read_frames_stream(spark: SparkSession, path: str,
                       frames_per_batch: int = 100) -> DataFrame:
    register(spark)
    return (spark.readStream.format("frame_replay")
            .option("path", path)
            .option("framesPerBatch", str(frames_per_batch))
            .load())


def read_frames_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch load of a capture file with arrival-order seq (single capture
    file = single connection's ordered frames; the per-file readers keep
    line order, and seq makes the order explicit for the kernel)."""
    lines = []
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.strip()
            if line:
                lines.append((i, line))
    return spark.createDataFrame(lines, REPLAY_SCHEMA)


def write_capture(path: str, frames: list[dict | str]) -> str:
    """Test helper: write frames (dicts or raw JSON strings) as a capture
    file, one frame per line."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        for f in frames:
            fh.write(f if isinstance(f, str) else json.dumps(f))
            fh.write("\n")
    return path

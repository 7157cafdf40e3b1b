"""Pipeline observability: a StreamingQueryListener that records per-batch
metrics (rows, duration, state size, watermark) as JSON lines.

The production analog of the reference's K5 console/log sink
(/root/reference/logging_agent.py:1-6, print-per-row at real_guac.py:88):
instead of printing rows, the listener captures the query-progress stream
Spark already emits — input rate, batch duration, state-store memory —
which is what you actually watch at cluster scale.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    """Append one JSON line per micro-batch to ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id),
                     "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "batch_duration_ms": p.batchDuration,
            "event_time": dict(p.eventTime or {}),
            "state_operators": [
                {"operator": getattr(so, "operatorName", None),
                 "rows_total": so.numRowsTotal,
                 "rows_updated": so.numRowsUpdated,
                 "memory_bytes": so.memoryUsedBytes}
                for so in (p.stateOperators or [])
            ],
        }
        self._write(row)

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id),
                     "exception": event.exception})

    def onQueryIdle(self, event) -> None:
        pass

    def _write(self, row: dict) -> None:
        with self._lock:
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(row, default=str) + "\n")


def attach_metrics(spark, path: str) -> JsonlMetricsListener:
    listener = JsonlMetricsListener(path)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark, listener: JsonlMetricsListener) -> None:
    spark.streams.removeListener(listener)

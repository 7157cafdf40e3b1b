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


def read_progress(path: str) -> list[dict]:
    """Parse a JsonlMetricsListener log back into its progress rows."""
    rows = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("event") == "progress":
                rows.append(row)
    return rows


def state_plateau_summary(path: str) -> dict:
    """State-economics summary of one drained query's metrics log — the
    bounded-state evidence for watermarked stateful operators (VERDICT r8
    task #6). For each micro-batch, sums the state operators' resident
    row count; returns the per-batch trajectory plus the numbers that
    certify the plateau:

    - ``cum_updated``: total rows ever PUT into state across the drain,
    - ``max_rows`` / ``final_rows``: peak and end-of-drain resident rows,
    - ``evicted``: cum_updated − final_rows (rows the watermark removed).

    A query whose state is bounded by its watermark horizon shows
    ``final_rows`` (and ``max_rows``) far below ``cum_updated`` on any
    replay longer than the horizon: resident state tracks the horizon ×
    arrival rate, not stream length. A leak (missing watermark, wrong
    eviction cutoff) shows final_rows ~= cum_updated instead."""
    trajectory = []
    cum_updated = 0
    for row in read_progress(path):
        ops = row.get("state_operators") or []
        if not ops:
            continue
        rows_total = sum(int(o.get("rows_total") or 0) for o in ops)
        updated = sum(int(o.get("rows_updated") or 0) for o in ops)
        cum_updated += updated
        trajectory.append({"batch_id": row.get("batch_id"),
                           "rows_total": rows_total,
                           "rows_updated": updated})
    max_rows = max((t["rows_total"] for t in trajectory), default=0)
    final_rows = trajectory[-1]["rows_total"] if trajectory else 0
    return {"trajectory": trajectory, "cum_updated": cum_updated,
            "max_rows": max_rows, "final_rows": final_rows,
            "evicted": cum_updated - final_rows}


def attach_metrics(spark, path: str) -> JsonlMetricsListener:
    listener = JsonlMetricsListener(path)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark, listener: JsonlMetricsListener) -> None:
    spark.streams.removeListener(listener)

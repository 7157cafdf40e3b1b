#!/usr/bin/env python
"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline set (lower is better).
Each query is materialized through the noop sink (``format("noop")``), which
executes the COMPLETE plan — every aggregate and sort survives, unlike
``count()`` where Catalyst prunes unreferenced result expressions (e.g.
q1's eight decimal sums would be dropped when only its 6 group rows are
counted) — without adding driver-collection transfer to the measurement.
A warm-up query runs first so JVM/codegen startup isn't attributed to the
first measured query.

Per-run timings are also appended to BENCH_HISTORY.jsonl (committed) so
later rounds can diff per-query regressions, not just the total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fictional_guacamole_spark.plans import REGISTRY  # noqa: E402
from fictional_guacamole_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("fg-bench")
    bench_queries = {n: q for n, q in REGISTRY.items() if q.bench}

    def materialize(df) -> None:
        # noop sink: full plan execution (nothing pruned), no collect cost
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: run the cheapest query once so session/codegen startup cost
    # is not attributed to the first measured query.
    materialize(REGISTRY["q6_forecast_revenue"].builder(spark, SF_DIR))

    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        # min of two runs: the host shows multi-second scheduling noise,
        # and min is the standard robust estimator for wall-time benches
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(q.builder(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    print(json.dumps(out))
    try:
        hist = dict(out, ts=int(time.time()),
                    round=os.environ.get("SPARK_GRAFT_ROUND"))
        with open(Path(__file__).resolve().parent / "BENCH_HISTORY.jsonl",
                  "a") as f:
            f.write(json.dumps(hist) + "\n")
    except OSError:
        pass  # history is best-effort; never fail the bench line
    spark.stop()


if __name__ == "__main__":
    main()

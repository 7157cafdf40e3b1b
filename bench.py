#!/usr/bin/env python
"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline set (lower is better).
Each query is fully materialized via ``df.count()`` after a warm-up of the
session (JVM + codegen warm), so the numbers measure plan execution, not
first-call JIT noise.
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

    # Warm-up: run the cheapest query once so session/codegen startup cost
    # is not attributed to the first measured query.
    warm = REGISTRY["q6_forecast_revenue"].builder(spark, SF_DIR)
    warm.count()

    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        # min of two runs: the host shows multi-second scheduling noise,
        # and min is the standard robust estimator for wall-time benches
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.builder(spark, SF_DIR)
            df.count()  # materialize the full result
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
    spark.stop()


if __name__ == "__main__":
    main()

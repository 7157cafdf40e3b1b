#!/usr/bin/env python
"""Round-15 evidence probe: Spark JOB COUNT and wall time of one
``dedup_components`` call on a chain graph (the worst-case label-diameter
shape the cascade's sem stage produces).

The r15 change fuses the convergence probe into the eager localCheckpoint
via an ``observe`` metric, dropping the separate count() job each cycle —
this probe makes the per-call job count visible before/after.

Usage:
    python tools/r15_components_probe.py [--nodes 1700] [--chain 9] [--runs 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fictional_guacamole_spark.functions.dedup import (  # noqa: E402
    dedup_components)
from fictional_guacamole_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1700)
    ap.add_argument("--chain", type=int, default=9)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("fg-r15-components-probe")
    sc = spark.sparkContext
    # chain components: node i links to i+1 within blocks of (chain+1)
    pairs = spark.range(args.nodes).selectExpr(
        "cast(id as string) as doc_a",
        "cast(id + 1 as string) as doc_b").filter(
        f"id % {args.chain + 1} != {args.chain} and id + 1 < {args.nodes}")
    ids = spark.range(args.nodes).selectExpr("cast(id as string) as doc")

    for run in range(args.runs):
        group = f"comp_probe_{run}"
        sc.setJobGroup(group, "dedup_components probe")
        t0 = time.perf_counter()
        out = dedup_components(pairs, ids)
        n = out.count()  # one extra job, constant across variants
        wall = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        print(f"run={run} wall={wall:.3f}s jobs={jobs} rows={n}")
        sc.setJobGroup("", "")


if __name__ == "__main__":
    main()

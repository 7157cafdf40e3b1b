#!/usr/bin/env python
"""Round-15 evidence probe: plan shape + wall time of ``read_delta`` on a
partitioned table with many distinct partition-value tuples.

Builds (once per run, under /tmp) a 50-partition-group Delta log whose data
files are copies of one seed parquet, reads it, and prints:

  - the formatted physical plan (for plans/r15/delta_read_partitioned_*.txt)
  - leaf count of the optimized plan (scan arms + manifest)
  - wall time of a noop materialization, min of --runs

Usage:
    python tools/r15_delta_plan_probe.py [--groups 50] [--runs 3]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fictional_guacamole_spark.session import get_spark  # noqa: E402
from fictional_guacamole_spark.sources.delta_log import (  # noqa: E402
    DeltaLogWriter, read_delta)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("fg-r15-delta-probe")
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    full = StructType([StructField("k", LongType()),
                       StructField("region", StringType())])

    base = os.path.join(tempfile.gettempdir(),
                        f"fg_delta_probe_{uuid.uuid4().hex[:8]}")
    w = DeltaLogWriter(base)
    seed = w.write_data_file(
        spark.range(1000).selectExpr("id as k"), "region=r0/part-0.parquet")
    adds = [w.add_action(seed, {"region": "r0"})]
    for i in range(1, args.groups):
        rel = f"region=r{i}/part-0.parquet"
        dest = os.path.join(base, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy(os.path.join(base, seed["path"]), dest)
        adds.append(w.add_action({**seed, "path": rel}, {"region": f"r{i}"}))
    w.commit([w.protocol_action(), w.metadata_action(full, ["region"]),
              *adds])

    t_plan0 = time.perf_counter()
    df = read_delta(spark, base)
    build_s = time.perf_counter() - t_plan0
    plan = df._jdf.queryExecution().optimizedPlan()
    leaves = plan.collectLeaves().size()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    print(buf.getvalue())

    times = []
    for _ in range(args.runs):
        spark.sparkContext.setJobDescription(
            f"delta probe read ({args.groups} groups)")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))
    print(f"## groups={args.groups} optimized-plan leaves={leaves} "
          f"dataframe-build={build_s:.3f}s noop-times={times} "
          f"rows={df.count()}", file=sys.stderr)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

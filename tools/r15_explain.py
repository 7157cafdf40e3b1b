#!/usr/bin/env python
"""Round-15 optimization tooling: capture `.explain("formatted")` for
registry queries (the judge-auditable plan artifacts under plans/r15/)
and time each query in isolation through the noop sink (guide §1.4).

Usage:
    python tools/r15_explain.py explain <query> [<query> ...] --out plans/r15 --suffix before
    python tools/r15_explain.py time <query> [<query> ...] [--runs 3]

The noop sink executes the COMPLETE plan; jobs are labelled with
setJobDescription so any UI/eventlog reading maps cleanly (guide §1.5).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fictional_guacamole_spark.plans import REGISTRY  # noqa: E402
from fictional_guacamole_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["explain", "time"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("fg-r15-tools")
    if args.mode == "explain":
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        for name in args.queries:
            df = REGISTRY[name].builder(spark, SF_DIR)
            path = outdir / f"{name}_{args.suffix}.txt"
            path.write_text(explain_str(df))
            print(f"wrote {path}")
    else:
        for name in args.queries:
            best, samples = float("inf"), []
            for _ in range(args.runs):
                spark.sparkContext.setJobDescription(f"r15-time:{name}")
                t0 = time.perf_counter()
                (REGISTRY[name].builder(spark, SF_DIR)
                 .write.format("noop").mode("overwrite").save())
                dt = time.perf_counter() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            spark.sparkContext.setJobDescription(None)
            print(f"{name}: min={best:.3f}s samples={samples}")
    spark.stop()


if __name__ == "__main__":
    main()

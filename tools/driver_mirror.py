#!/usr/bin/env python
"""Strict pre-flight mirror of the driver's CORRECTNESS comparator.

The driver runs each judged query in Spark AND its DuckDB oracle, pulls both
results into pandas, canonicalizes (sort columns by name, sort rows by all
columns), and hash-compares values. Crucially the hash is sensitive to the
*pandas-level* representation after each engine's own conversion — e.g. a
DuckDB HUGEINT becomes float64 ("1175.0") while Spark's BIGINT stays int64
("1175"), which is exactly how q12_priority_shipping failed round 1 with
value-identical results.

This script reproduces that pipeline more faithfully than
tests/test_oracle_parity.py (which compares collected Python objects):

    spark.builder(...).toPandas()   vs   duckdb.sql(oracle).df()
    -> canon: columns sorted by name, rows sorted by all columns
    -> cell repr: str() of the pandas cell (dtype-coloured: 1175 vs 1175.0)
    -> sha256 over the sorted row lines

Run:  python tools/driver_mirror.py [query ...]   (default: JUDGE_WINDOW)
Exit code = number of mismatching queries.
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fictional_guacamole_spark.plans import JUDGE_WINDOW, REGISTRY  # noqa: E402
from fictional_guacamole_spark.session import get_spark  # noqa: E402
from fictional_guacamole_spark.tables import TABLE_NAMES  # noqa: E402

# Overridable for the scale-up sweep (tools/make_scale_dataset.py builds
# a ~sf1 replica set outside /root/testdata); the driver itself judges at
# sf0.01, which stays the default.
import os  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_MIRROR_SF_DIR", "/root/testdata/sf0.01")


def _cell(v) -> str:
    # mirror a value-stringifying canonicalizer: dtype leaks through repr
    # (int64 1175 -> "1175", float64 1175.0 -> "1175.0", Decimal -> "3.50")
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"  # pandas conflates NaN/None in float cols
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return "NULL"
    return str(v)


def _canon_hash(df: pd.DataFrame) -> tuple[str, list[str]]:
    df = df[sorted(df.columns)]
    lines = sorted(
        "|".join(_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main() -> int:
    names = sys.argv[1:] or [n for n in JUDGE_WINDOW if REGISTRY[n].oracle]
    spark = get_spark("fg-driver-mirror")
    # Scale-sweep knobs (no effect on the judged comparison): DuckDB's
    # default memory_limit is 80% of RAM, which stacks on top of the Spark
    # JVM heap in the same process tree and got the sf10 replay OOM-killed
    # (73 GB RSS) — cap it so heavy replays SPILL to $CWD/.tmp instead.
    duck_cfg = {}
    if os.environ.get("SPARK_GRAFT_DUCKDB_MEM"):
        duck_cfg["memory_limit"] = os.environ["SPARK_GRAFT_DUCKDB_MEM"]
    if os.environ.get("SPARK_GRAFT_DUCKDB_THREADS"):
        duck_cfg["threads"] = int(os.environ["SPARK_GRAFT_DUCKDB_THREADS"])
    duck = duckdb.connect(config=duck_cfg)
    for t in TABLE_NAMES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            print(f"SKIP  {name} (rows-only)")
            continue
        try:
            import time as _time
            t0 = _time.perf_counter()
            sdf = q.builder(spark, SF_DIR).toPandas()
            spark_s = _time.perf_counter() - t0
            ddf = duck.sql(q.oracle).df()
            sh, slines = _canon_hash(sdf)
            dh, dlines = _canon_hash(ddf)
        except Exception as e:  # driver records this as err
            failures.append(name)
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        if list(sorted(sdf.columns)) != list(sorted(ddf.columns)):
            failures.append(name)
            print(f"COLS  {name}: spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
        elif len(sdf) != len(ddf):
            failures.append(name)
            print(f"ROWS  {name}: spark={len(sdf)} duck={len(ddf)}")
        elif sh != dh:
            failures.append(name)
            ds, ss = set(dlines), set(slines)
            only_s = [l for l in slines if l not in ds][:2]
            only_d = [l for l in dlines if l not in ss][:2]
            sdt = dict(zip(sdf[sorted(sdf.columns)].columns,
                           [str(t) for t in sdf[sorted(sdf.columns)].dtypes]))
            ddt = dict(zip(ddf[sorted(ddf.columns)].columns,
                           [str(t) for t in ddf[sorted(ddf.columns)].dtypes]))
            diff_dt = {c: (sdt[c], ddt[c]) for c in sdt if sdt[c] != ddt[c]}
            print(f"HASH  {name}: dtype-diff={diff_dt}\n"
                  f"      spark-only={only_s}\n      duck-only={only_d}")
        else:
            print(f"OK    {name} ({len(sdf)} rows, spark {spark_s:.2f}s)")
    print(f"\n{len(failures)} mismatching: {failures}")
    spark.stop()
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())

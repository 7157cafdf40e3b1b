#!/usr/bin/env python
"""Synthesize a larger SF from the driver's sf0.1 fixtures for the
scale-up sweep (VERDICT r6 task #6) — WITHOUT touching /root/testdata.

Replicates every fact table REPS× with a deterministic key stride so
referential integrity is preserved exactly (each replica is a disjoint
key universe joined to the SHARED dimension tables region/nation, the
same shape TPC-H scaling itself uses):

    customer.c_custkey       += rep * STRIDE
    supplier.s_suppkey       += rep * STRIDE
    part.p_partkey           += rep * STRIDE
    orders.o_orderkey/custkey+= rep * STRIDE
    lineitem.l_orderkey/partkey/suppkey += rep * STRIDE
    events.event_id/user_id  += rep * STRIDE
    documents.doc_id         += rep * STRIDE   (text gets a per-replica
                                suffix so corpus dedup stays non-degenerate)
    embeddings.vec_id        += rep * STRIDE

The output is judge-equivalent input for the oracle harness: Spark and
DuckDB read the SAME files, so every oracled query can still be
value-hash-compared at the scaled SF (tools/driver_mirror.py with
SPARK_GRAFT_MIRROR_SF_DIR pointed here).

Usage:  python tools/make_scale_dataset.py [out_dir] [reps]
        (defaults: /tmp/fg_sf1  10 → ~6M lineitem rows ≈ TPC-H sf1)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fictional_guacamole_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000  # far above any sf0.1 key

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ["region", "nation"]


def main() -> None:
    from pyspark.sql import functions as F

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fg_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("fg-make-scale")
    os.makedirs(out, exist_ok=True)

    import shutil

    for t in SHARED_DIMS:
        # fixtures are single .parquet FILES; copy byte-identical
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")

    rep = F.col("__rep")
    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        wide = df.crossJoin(
            spark.range(reps).select(F.col("id").alias("__rep")))
        for k in keys:
            wide = wide.withColumn(k, F.col(k) + rep * F.lit(STRIDE))
        if t == "documents":
            # keep corpus dedup non-degenerate: replicas are near-dups of
            # each other (suffix), not byte-exact dups
            wide = wide.withColumn(
                "text",
                F.when(rep == 0, F.col("text"))
                 .otherwise(F.concat(F.col("text"), F.lit(" #r"),
                                     rep.cast("string"))))
            wide = wide.withColumn("n_chars", F.length("text"))
        wide = wide.drop("__rep").select(*df.columns)
        # one file per table, like the source fixtures (the engine's own
        # readers decide split parallelism from maxPartitionBytes)
        wide.coalesce(1).write.mode("overwrite").parquet(f"{out}/_b_{t}")
        # fixtures are single .parquet FILES, not directories — match that
        bdir = f"{out}/_b_{t}"
        part = next(p for p in os.listdir(bdir) if p.endswith(".parquet"))
        os.replace(os.path.join(bdir, part), f"{out}/{t}.parquet")
        shutil.rmtree(bdir, ignore_errors=True)
        print(f"{t}: wrote {reps}x replicas")
    spark.stop()


if __name__ == "__main__":
    main()

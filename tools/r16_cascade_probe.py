#!/usr/bin/env python
"""Round-16 probe: attribute pipeline_dedup_cascade's wall time to its
stages (guide §1 — measure first), and show the tokenize-subtree sharing
that the final frame's lineage-truncated explain cannot.

Stages timed (the eager checkpoints are the natural boundaries):
  s1    exact-dedup survivor checkpoint
  mh    stage-2 LSH pairs + components (incl. the shared words-frame
        cache fill) up to the mh_comp checkpoint
  sem_vec   stage-3 dense-vector checkpoint (hashed-TF leg)
  sem_pairs stage-3 banding + verify + components (to the final labels)
  out   final join/sort materialized through the noop sink

Also dumps the sem-stage CANDIDATE subtree's formatted plan (the frame
band_candidates consumes, pre-checkpoint), where the shared words frame
is visible as an InMemoryTableScan instead of a second
scan→join→normalize→split pipeline.

Usage: python tools/r16_cascade_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fictional_guacamole_spark.functions import curation as C  # noqa: E402
from fictional_guacamole_spark.functions import dedup as D  # noqa: E402
from fictional_guacamole_spark.functions.text import normalize  # noqa: E402
from fictional_guacamole_spark.session import get_spark  # noqa: E402
from fictional_guacamole_spark.tables import load_table  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def run_once(spark, sf_dir: str, label: str) -> dict:
    t: dict[str, float] = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(F.col("doc_id").alias("doc"),
                     F.md5(normalize(F.col("text"))).alias("fp"))
    rep1 = fp.withColumn("exact_rep", F.min("doc").over(W.partitionBy("fp")))
    s1 = (rep1.filter(F.col("doc") == F.col("exact_rep"))
          .select("doc").localCheckpoint(eager=True))
    mark("s1_checkpoint", t0)

    t0 = time.perf_counter()
    s1_docs = (docs.join(s1.select(F.col("doc").alias("doc_id")), "doc_id")
               .repartition(spark.sparkContext.defaultParallelism,
                            F.col("doc_id")))
    s1_w = D.words_frame(s1_docs, "doc_id", "text").cache()
    mh_pairs = (D.minhash_lsh_pairs_from_words(s1_w, n=3)
                .filter(F.col("est_jaccard") >= 0.5)
                .select("doc_a", "doc_b"))
    mh_comp = D.dedup_components(mh_pairs, s1).localCheckpoint(eager=True)
    mark("mh_pairs_plus_components", t0)

    t0 = time.perf_counter()
    s2 = (mh_comp.filter(F.col("doc") == F.col("canonical_id"))
          .select("doc"))
    s2_w = s1_w.join(s2, "doc")
    sem_pairs = C.semantic_pairs_from_words(s2_w, tau_num=9, tau_den=10,
                                            shingle_n=1)
    mark("sem_vec_checkpoint", t0)  # the eager vec checkpoint ran inside

    t0 = time.perf_counter()
    sem_comp = D.dedup_components(sem_pairs, s2)
    mark("sem_pairs_plus_components", t0)

    t0 = time.perf_counter()
    mh = mh_comp.select("doc", F.col("canonical_id").alias("mh_canon"))
    sem = sem_comp.select("doc", F.col("canonical_id").alias("sem_canon"))
    out = (rep1.select("doc", "exact_rep")
           .join(mh, "doc", "left").join(sem, "doc", "left"))
    stage = (F.when(F.col("doc") != F.col("exact_rep"), F.lit("exact"))
             .when(F.col("mh_canon") != F.col("doc"), F.lit("near_dup"))
             .when(F.col("sem_canon") != F.col("doc"), F.lit("semantic"))
             .otherwise(F.lit("kept")))
    rep = (F.when(F.col("doc") != F.col("exact_rep"), F.col("exact_rep"))
           .when(F.col("mh_canon") != F.col("doc"), F.col("mh_canon"))
           .when(F.col("sem_canon") != F.col("doc"), F.col("sem_canon"))
           .otherwise(F.col("doc")))
    (out.select("doc", stage.alias("stage"), rep.alias("rep"))
     .orderBy("doc").write.format("noop").mode("overwrite").save())
    mark("final_join_sort", t0)

    t["total"] = round(sum(t.values()), 3)
    print(f"[{label}] " + "  ".join(f"{k}={v}" for k, v in t.items()))
    s1_w.unpersist()
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dump-sem-plan", action="store_true")
    args = ap.parse_args()

    spark = get_spark("fg-r16-cascade-probe")
    spark.sparkContext.setJobDescription("r16 cascade stage probe")
    for i in range(args.runs):
        run_once(spark, args.sf, f"run{i}")

    if args.dump_sem_plan:
        # the sem-stage candidate subtree (pre-checkpoint): the shared
        # words frame shows as InMemoryTableScan here
        docs = load_table(spark, args.sf, "documents")
        w = D.words_frame(docs, "doc_id", "text").cache()
        sig = D.minhash_signatures_from_shingles(
            D.shingle_rows_from_words(w, 1))
        cand = D.band_candidates(D.minhash_band_keys(sig))
        vec = C._dense_vectors(C.hashed_tf_from_words(w), "c", C.HASH_DIM)
        print("=== sem candidate subtree ===")
        print(explain_str(cand))
        print("=== sem dense-vector subtree ===")
        print(explain_str(vec))
    spark.stop()


if __name__ == "__main__":
    main()

"""Curation-operator tests (functions/curation.py, plans/curation.py):
integer-exactness of the weighted-sampling keys against a pure-Python
hashlib reference, Efraimidis–Spirakis distributional sanity, temperature-
mix apportionment invariants, semantic-dedup candidate recall vs the exact
all-pairs baseline, incremental-minhash/chained-agg/join-then-agg
invariants, the curation-capstone manifest contract, and plan-quality
gates.
"""

from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import curation as C
from fictional_guacamole_spark.plans import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"
SF_JUDGED = "/root/testdata/sf0.01"


def _py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


class TestWeightedSampleKey:
    def test_key_matches_hashlib_reference(self, spark):
        rows = [(7, 1), (8, 3), (9, 64)]
        df = spark.createDataFrame(rows, "doc long, weight long")
        got = {r["doc"]: r["k"] for r in df.select(
            "doc", C.weighted_sample_key(F.col("doc"), F.col("weight"))
            .alias("k")).collect()}
        for doc, w in rows:
            want = min(_py_md5_long(f"{doc}:{i}") for i in range(1, w + 1))
            assert got[doc] == want

    def test_higher_weight_wins_more_often(self, spark):
        # E-S property, empirically: weight-8 docs should out-select
        # weight-1 docs roughly 8:1 in the bottom-k. 400 docs, half at
        # w=1, half at w=8, k=100 → expect ~89 heavy picks; assert a
        # loose floor (the draw is deterministic, so this is a fixed
        # fact about the md5 stream, not a flaky sample).
        rows = [(i, 8 if i % 2 == 0 else 1) for i in range(400)]
        df = spark.createDataFrame(rows, "doc long, weight long")
        keyed = df.select("doc", "weight",
                          C.weighted_sample_key(F.col("doc"),
                                                F.col("weight")).alias("k"))
        top = keyed.orderBy("k", "doc").limit(100).collect()
        heavy = sum(1 for r in top if r["weight"] == 8)
        assert heavy >= 75, heavy

    def test_query_row_invariants(self, spark):
        out = REGISTRY["sample_weighted_bottomk"].builder(
            spark, SF_SMALL).collect()
        assert len(out) == 100
        assert [r["rank"] for r in out] == list(range(1, 101))
        keys = [r["sample_key"] for r in out]
        assert keys == sorted(keys)
        assert all(1 <= r["weight"] <= C.W_CAP for r in out)


class TestTemperatureMix:
    def test_apportionment_invariants(self, spark):
        rows = REGISTRY["pipeline_temperature_mix"].builder(
            spark, SF_JUDGED).collect()
        # budget = 500 // 4 exactly, met exactly (largest-remainder)
        assert len(rows) == 125
        by_dom = {}
        for r in rows:
            by_dom.setdefault(r["domain"], []).append(r)
        # per-domain pick_rank is 1..alloc and allocs sum to the budget
        allocs = {}
        for dom, picks in by_dom.items():
            ranks = sorted(p["pick_rank"] for p in picks)
            assert ranks == list(range(1, len(picks) + 1))
            allocs[dom] = picks[0]["alloc"]
            assert len(picks) == allocs[dom]
        assert sum(allocs.values()) == 125

    def test_temperature_flattens_the_skew(self, spark):
        # domain sizes at sf0.01 are 25/75/125/175/100; α=0.5 must give
        # the smallest domain a larger share than proportional and the
        # largest a smaller share.
        rows = REGISTRY["pipeline_temperature_mix"].builder(
            spark, SF_JUDGED).collect()
        share = {}
        for r in rows:
            share[r["domain"]] = share.get(r["domain"], 0) + 1
        total = sum(share.values())
        # proportional shares: 25/500 = 5%, 175/500 = 35%
        assert share["d0"] / total > 25 / 500
        assert share["d3"] / total < 175 / 500


class TestSemanticDedup:
    @pytest.fixture(scope="class")
    def tf_pairs(self, spark):
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_SMALL, "documents")
        tf = {(r["doc"], r["dim"]): r["c"]
              for r in C.hashed_tf(docs, "doc_id", "text").collect()}
        by_doc = {}
        for (doc, dim), c in tf.items():
            by_doc.setdefault(doc, {})[dim] = c
        found = {(r["doc_a"], r["doc_b"])
                 for r in C.semantic_pairs(docs, "doc_id", "text").collect()}
        return by_doc, found

    def test_verified_pairs_truly_clear_tau(self, tf_pairs):
        by_doc, found = tf_pairs
        for a, b in found:
            va, vb = by_doc[a], by_doc[b]
            dot = sum(va[d] * vb.get(d, 0) for d in va)
            na = sum(c * c for c in va.values())
            nb = sum(c * c for c in vb.values())
            assert 400 * dot * dot >= 361 * na * nb, (a, b)

    def test_candidate_recall_vs_exact_all_pairs(self, tf_pairs):
        # exact τ≥0.95 pairs via brute force; the MinHash-blocked
        # candidates must recover at least the measured floor (fixed
        # fixture + fixed md5 stream → a deterministic fact; measured
        # 92–97 % across sf0.001–sf0.1, see functions/curation.py).
        by_doc, found = tf_pairs
        docs = sorted(by_doc)
        exact = set()
        for a, b in itertools.combinations(docs, 2):
            va, vb = by_doc[a], by_doc[b]
            dot = sum(va[d] * vb.get(d, 0) for d in va)
            na = sum(c * c for c in va.values())
            nb = sum(c * c for c in vb.values())
            if 400 * dot * dot >= 361 * na * nb:
                exact.add((a, b))
        assert found <= exact  # verification is exact → no false positives
        if exact:
            recall = len(found) / len(exact)
            assert recall >= 0.9, (len(found), len(exact))

    def test_cluster_output_invariants(self, spark):
        rows = REGISTRY["dedup_semantic_embedding"].builder(
            spark, SF_SMALL).collect()
        assert len(rows) == 500  # every doc labeled
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], []).append(r)
        for cl, members in by_cluster.items():
            assert cl == min(m["doc"] for m in members)  # canonical = min
            reps = [m for m in members if m["is_rep"]]
            assert len(reps) == 1 and reps[0]["doc"] == cl
            assert all(m["n_members"] == len(members) for m in members)


class TestSemanticPretrained:
    @pytest.fixture(scope="class")
    def qv_and_pairs(self, spark):
        """Quantized corpus (originals + replicas) and the judged pair
        set, both pulled once for the class."""
        import numpy as np
        from fictional_guacamole_spark.tables import load_table
        emb = load_table(spark, SF_SMALL, "embeddings")
        rows = emb.select("vec_id", "embedding").collect()
        vecs = {}
        for r in rows:
            v = np.floor(np.array(r["embedding"], dtype=np.float32)
                         .astype(np.float64) * C.SEM_SCALE)
            vecs[r["vec_id"]] = v
            if r["vec_id"] % 5 == 0:
                w = (np.array(r["embedding"], dtype=np.float32)
                     .astype(np.float64) * C.SEM_SCALE)
                w[r["vec_id"] % C.SEM_DIM] *= 2
                vecs[r["vec_id"] + 100000] = np.floor(w)
        out = REGISTRY["dedup_semantic_pretrained"].builder(
            spark, SF_SMALL).collect()
        return vecs, out

    def test_plane_signs_match_spark_md5(self, spark):
        # the Python-literal Rademacher entries inlined into the Spark
        # plan must equal the md5 draw both SQL engines compute
        from fictional_guacamole_spark.functions.dedup import md5_long
        df = spark.range(12).select(
            (F.col("id") % 4).alias("p"), (F.col("id") % 3).alias("i"))
        got = df.select(
            "p", "i",
            (md5_long(F.concat_ws("", F.lit("semplane:"),
                                  F.col("p").cast("string"), F.lit(":"),
                                  F.col("i").cast("string")))
             % 2 * 2 - 1).alias("s")).collect()
        for r in got:
            assert r["s"] == C.srp_plane_sign(r["p"], r["i"])

    def test_clusters_are_exactly_the_true_tau_pairs_modulo_blocking(
            self, qv_and_pairs):
        # exact τ≥0.9 ground truth by brute force over quantized ints;
        # judged clusters must contain ONLY true pairs (exact verify →
        # no false merges) and recover ≥95 % of true pairs (SRP
        # blocking recall — deterministic for the fixed fixture+planes)
        import numpy as np
        vecs, out = qv_and_pairs
        ids = sorted(vecs)
        true_pairs = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = vecs[a], vecs[b]
                dot = float(va @ vb)
                if dot >= 0 and 100 * dot * dot >= 81 * float(
                        va @ va) * float(vb @ vb):
                    true_pairs.add((a, b))
        clusters = {}
        for r in out:
            clusters.setdefault(r["cluster"], []).append(r["doc"])
        got_pairs = set()
        for members in clusters.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1:]:
                    got_pairs.add((a, b))
        # transitive closure can only merge true pairs' components, so
        # every got pair must lie inside one true component — with the
        # fixture's doubleton-only truth, got ⊆ true exactly
        assert got_pairs <= true_pairs
        assert true_pairs, "fixture lost its injected near-dups"
        recall = len(got_pairs) / len(true_pairs)
        assert recall >= 0.95, (len(got_pairs), len(true_pairs))

    def test_every_doc_labeled_and_reps_canonical(self, qv_and_pairs):
        vecs, out = qv_and_pairs
        assert {r["doc"] for r in out} == set(vecs)
        for r in out:
            assert r["is_rep"] == (r["doc"] == r["cluster"])

    def test_replicas_cluster_with_their_original(self, qv_and_pairs):
        # ≥95 % of injected replicas must land in their original's
        # cluster (the blocking-recall contract made concrete)
        vecs, out = qv_and_pairs
        cl = {r["doc"]: r["cluster"] for r in out}
        reps = [d for d in vecs if d >= 100000]
        hit = sum(1 for d in reps if cl[d] == cl[d - 100000])
        assert reps and hit / len(reps) >= 0.95, (hit, len(reps))

    def test_dense_pipeline_matches_exploded_reference(self, spark):
        # r15 optimization parity: the dense map-side quantization and
        # its band keys must equal the exploded (doc, dim, q) reference
        # forms element-for-element on the fixture corpus
        from fictional_guacamole_spark.tables import load_table
        emb = load_table(spark, SF_SMALL, "embeddings")
        qd = {r["doc"]: list(r["v"])
              for r in C.quantized_embeddings_dense(emb).collect()}
        ref = {}
        for r in C.quantized_embedding_rows(emb).collect():
            ref.setdefault(r["doc"], [0] * C.SEM_DIM)[r["dim"]] = r["q"]
        assert qd == ref
        dense_bk = {(r["doc"], r["band"]): r["band_sig"]
                    for r in C.srp_band_keys_dense(
                        C.quantized_embeddings_dense(emb)).collect()}
        ref_bk = {(r["doc"], r["band"]): r["band_sig"]
                  for r in C.srp_band_keys(
                      C.quantized_embedding_rows(emb)).collect()}
        assert dense_bk == ref_bk

    @pytest.mark.parametrize("dim", [8, 256, 1024])
    def test_dense_vectors_scatter_matches_map_probe_reference(
            self, spark, dim):
        # r16 optimization parity (verdict task #6): the O(nnz + dim)
        # scatter build must equal the r15 map-probe form (one
        # try_element_at per output slot) element-for-element, including
        # the edge shapes: an entry at dim 0, an entry at dim-1, a
        # single-entry doc, and a fully-dense doc.
        rows = [(1, 0, 3), (1, dim - 1, 5),          # both boundary dims
                (2, dim // 2, 7),                    # single mid entry
                (3, 0, 1), (3, 1, 2), (3, 2, 9)]     # leading run
        rows += [(4, d, d + 1) for d in range(dim)]  # fully dense
        df = spark.createDataFrame(rows, "doc long, dim long, c long")

        def map_probe(r):                            # the r15 reference
            m = r.groupBy("doc").agg(
                F.map_from_entries(F.collect_list(
                    F.struct(F.col("dim").cast("int").alias("k"),
                             F.col("c").alias("v")))).alias("m"),
                F.sum(F.col("c") * F.col("c")).alias("n2"))
            idx = F.sequence(F.lit(0), F.lit(dim - 1))
            return m.select(
                "doc",
                F.transform(idx, lambda i: F.coalesce(
                    F.try_element_at("m", i),
                    F.lit(0).cast("long"))).alias("v"),
                "n2")

        want = {r["doc"]: (list(r["v"]), r["n2"])
                for r in map_probe(df).collect()}
        got = {r["doc"]: (list(r["v"]), r["n2"])
               for r in C._dense_vectors(df, "c", dim).collect()}
        assert got == want
        assert all(len(v) == dim for v, _ in got.values())

    def test_words_frame_filter_commutes_with_tokenize(self, spark):
        # the cascade's shared-token-frame substitution (r16): filtering
        # the words frame by surviving doc keys must equal tokenizing the
        # filtered documents — tokenization is per-row
        from fictional_guacamole_spark.functions import dedup as D
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_SMALL, "documents")
        keys = docs.filter(F.col("doc_id") % 3 == 0) \
                   .select(F.col("doc_id").alias("doc"))
        via_join = {r["doc"]: list(r["__w"]) for r in
                    D.words_frame(docs, "doc_id", "text")
                    .join(keys, "doc").collect()}
        via_filter = {r["doc"]: list(r["__w"]) for r in
                      D.words_frame(docs.filter(F.col("doc_id") % 3 == 0),
                                    "doc_id", "text").collect()}
        assert via_join == via_filter and via_join


class TestDedupCascade:
    @pytest.fixture(scope="class")
    def fate(self, spark):
        return REGISTRY["pipeline_dedup_cascade"].builder(
            spark, SF_SMALL).collect()

    def test_every_doc_has_exactly_one_fate(self, fate, spark):
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_SMALL, "documents")
        assert {r["doc"] for r in fate} == {
            r["doc_id"] for r in docs.select("doc_id").collect()}
        assert {r["stage"] for r in fate} <= {
            "exact", "near_dup", "semantic", "kept"}

    def test_reps_are_stage_valid(self, fate):
        by_doc = {r["doc"]: r for r in fate}
        kept = {r["doc"] for r in fate if r["stage"] == "kept"}
        for r in fate:
            if r["stage"] == "kept":
                assert r["rep"] == r["doc"]
            else:
                # a representative always outranks (min-id) its loser
                assert r["rep"] < r["doc"]
            if r["stage"] == "exact":
                # exact rep survived stage 1 (it may die later)
                assert by_doc[r["rep"]]["stage"] != "exact"
            if r["stage"] in ("near_dup", "semantic"):
                # near-dup/semantic canonicals are stage-2/3 survivors'
                # minimum — they were exact-stage survivors by definition
                assert by_doc[r["rep"]]["stage"] != "exact"
        assert kept, "cascade must keep something"

    def test_every_stage_is_live(self, fate):
        # each stage must actually eliminate documents on the fixture —
        # a dead stage would judge green while testing nothing (the
        # original τ=0.95/3-gram stage 3 was measured dead: every pair
        # it could see was already minhash-caught)
        stages = {r["stage"] for r in fate}
        assert "near_dup" in stages
        assert "semantic" in stages
        assert "kept" in stages

    def test_semantic_stage_catches_what_minhash_cannot(self, fate, spark):
        # every semantic-dropped doc must NOT be minhash-droppable: its
        # pair evidence lives in bag-of-words space (1-gram blocking,
        # cos >= 0.9) while its 3-gram est_jaccard with the rep is < 0.5
        from fictional_guacamole_spark.functions import dedup as D
        from fictional_guacamole_spark.tables import load_table
        sem = {(min(r["doc"], r["rep"]), max(r["doc"], r["rep"]))
               for r in fate if r["stage"] == "semantic"}
        assert sem
        docs = load_table(spark, SF_SMALL, "documents")
        mh = {(r["doc_a"], r["doc_b"])
              for r in D.minhash_lsh_pairs(docs, "doc_id", "text", n=3)
              .filter(F.col("est_jaccard") >= 0.5).collect()}
        # stage-3 pair evidence is between SURVIVORS; a semantic rep pair
        # that the 3-gram stage could see would have been collapsed there
        assert not (sem & mh), sem & mh

    def test_stage1_agrees_with_exact_dedup_row(self, fate, spark):
        # docs the cascade kills at stage 1 = non-canonical members of
        # the judged exact-dedup row's fingerprint groups
        rows = REGISTRY["dedup_exact_documents"].builder(
            spark, SF_SMALL).collect()
        n_exact_losers = sum(r["n_copies"] - 1 for r in rows)
        assert sum(1 for r in fate if r["stage"] == "exact") \
            == n_exact_losers


class TestPlanQuality:
    def test_weighted_sample_has_no_global_sort(self, spark):
        df = REGISTRY["sample_weighted_bottomk"].builder(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the selection itself must be TakeOrdered; the only acceptable
        # sort is over the ≤k survivors
        assert "TakeOrderedAndProject" in plan

    def test_no_python_udfs_anywhere(self, spark):
        for name in ("sample_weighted_bottomk", "pipeline_temperature_mix",
                     "dedup_semantic_embedding"):
            df = REGISTRY[name].builder(spark, SF_SMALL)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name


class TestIncrementalMinhash:
    @pytest.fixture(scope="class")
    def out(self, spark):
        return REGISTRY["dedup_incremental_minhash"].builder(
            spark, SF_JUDGED).collect()

    def test_row_per_incoming_doc(self, out, spark):
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_JUDGED, "documents")
        n_incoming = docs.filter(F.col("doc_id") >= 300).count()
        assert len(out) == n_incoming
        assert all(r["doc"] >= 300 for r in out)

    def test_match_invariants(self, out):
        for r in out:
            if r["novel"]:
                assert r["best_match"] is None and r["best_est"] is None
            else:
                assert r["best_match"] < 300
                assert r["best_est"] >= 0.5
                # est is an exact multiple of 1/32 in both engines
                assert (r["best_est"] * 32) == int(r["best_est"] * 32)

    def test_exact_copies_are_flagged(self, out, spark):
        # any incoming doc byte-identical (normalized) to a historical
        # doc must NOT be novel: identical shingle sets → identical
        # signatures → every band collides, est_jaccard = 1.0
        from fictional_guacamole_spark.functions.text import normalize
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_JUDGED, "documents")
        fps = docs.select("doc_id",
                          F.md5(normalize(F.col("text"))).alias("fp"))
        hist = fps.filter(F.col("doc_id") < 300).select("fp").distinct()
        copies = {r["doc_id"] for r in
                  fps.filter(F.col("doc_id") >= 300)
                  .join(hist, "fp").collect()}
        flagged = {r["doc"] for r in out if not r["novel"]}
        assert copies <= flagged
        exact = {r["doc"] for r in out
                 if not r["novel"] and r["best_est"] == 1.0}
        assert copies <= exact


class TestChainedAgg:
    def test_rollup_invariants(self, spark):
        rows = REGISTRY["stream_engine_chained_agg"].builder(
            spark, SF_JUDGED).collect()
        assert rows, "drain produced no finalized hourly windows"
        for r in rows:
            assert 1 <= r["n_buckets"] <= 4  # ≤ four 15-min buckets/hour
            assert r["max_bucket"] <= r["n_events"]
            assert r["n_events"] >= r["n_buckets"]  # each bucket ≥ 1 event


class TestDsirImportance:
    def test_selection_invariants_and_target_skew(self, spark):
        from fictional_guacamole_spark.tables import load_table
        rows = REGISTRY["pipeline_dsir_importance"].builder(
            spark, SF_JUDGED).collect()
        assert [r["rank"] for r in rows] == list(range(1, 51))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # the importance ranking must be target-seeking: English docs
        # should be over-represented in the top-50 vs their corpus share
        docs = load_table(spark, SF_JUDGED, "documents")
        lang = {r["doc_id"]: r["lang"]
                for r in docs.select("doc_id", "lang").collect()}
        top_en = sum(1 for r in rows if lang[r["doc"]] == "en") / len(rows)
        corpus_en = (sum(1 for v in lang.values() if v == "en")
                     / len(lang))
        assert top_en > corpus_en, (top_en, corpus_en)


class TestJoinThenAgg:
    def test_rollup_invariants(self, spark):
        rows = REGISTRY["stream_engine_join_then_agg"].builder(
            spark, SF_JUDGED).collect()
        assert rows, "drain produced no finalized windows"
        for r in rows:
            assert r["n_attributed"] >= 1
            assert r["min_view"] <= r["max_view"]
        starts = [r["window_start"] for r in rows]
        assert starts == sorted(starts)


class TestCurationCapstone:
    @pytest.fixture(scope="class")
    def manifest(self, spark):
        return REGISTRY["pipeline_curation_corpus"].builder(
            spark, SF_JUDGED).collect()

    def test_quota_and_rank_invariants(self, manifest):
        by_dom = {}
        for r in manifest:
            by_dom.setdefault(r["domain"], []).append(r)
        for dom, picks in by_dom.items():
            ranks = sorted(p["pick_rank"] for p in picks)
            assert ranks == list(range(1, len(picks) + 1)), dom
            assert all(p["alloc"] == len(picks) for p in picks), dom
        # every selected doc clears the quality gate's weight floor
        # (weight = clipped token count; gate is 20 tokens)
        assert all(20 <= r["weight"] <= C.W_CAP for r in manifest)

    def test_selection_is_dedup_survivors_only(self, manifest, spark):
        # no two selected docs may be near-duplicates of each other:
        # re-run the pair evidence and assert no selected pair collides
        from fictional_guacamole_spark.functions import dedup as D
        from fictional_guacamole_spark.tables import load_table
        docs = load_table(spark, SF_JUDGED, "documents")
        pairs = (D.minhash_lsh_pairs(docs, "doc_id", "text", n=3)
                 .filter(F.col("est_jaccard") >= 0.5).collect())
        selected = {r["doc"] for r in manifest}
        for p in pairs:
            assert not (p["doc_a"] in selected and p["doc_b"] in selected), p


class TestTemperatureAllocClamp:
    def test_tiny_domain_quota_clamps_at_size(self, spark):
        # {1, 99} split: budget=25, sqrt weights (1, 9) — unclamped
        # Hamilton would hand the 1-doc domain floor(25/10)+bump = 2..3;
        # the clamp must cap it at 1 and NOT silently reassign the
        # surplus (sum(alloc) < budget is the honest signal).
        rows = ([("tiny", i) for i in range(1)]
                + [("big", 100 + i) for i in range(99)])
        df = (spark.createDataFrame(rows, "domain string, doc long")
              .groupBy("domain").agg(F.count(F.lit(1)).alias("n_d")))
        alloc = {r["domain"]: r["alloc"]
                 for r in C.temperature_alloc(df, "domain",
                                              budget_div=4).collect()}
        assert alloc["tiny"] == 1          # clamped at domain size
        assert alloc["big"] <= 99
        assert sum(alloc.values()) <= 25   # never over budget

    def test_no_clamp_means_exact_budget(self, spark):
        # the judged fixture shape (no clamp fires): quotas sum exactly
        sizes = {"a": 25, "b": 75, "c": 125, "d": 175, "e": 100}
        rows = [(d, i) for d, n in sizes.items() for i in range(n)]
        df = (spark.createDataFrame(rows, "domain string, doc long")
              .groupBy("domain").agg(F.count(F.lit(1)).alias("n_d")))
        alloc = {r["domain"]: r["alloc"]
                 for r in C.temperature_alloc(df, "domain",
                                              budget_div=4).collect()}
        assert sum(alloc.values()) == 125


class TestTfCapOverflowGuard:
    def test_repetitive_docs_cannot_overflow_the_cosine_compare(self, spark):
        # two docs of 40k repetitions of one word: uncapped counts give
        # na*nb ~ 2.6e18 and 361*na*nb overflows int64 (silent wrap in
        # non-ANSI Spark, hard error in DuckDB). The TF_CAP clip bounds
        # na,nb <= HASH_DIM*TF_CAP^2 so the compare stays exact — and the
        # identical pair must still verify at cos = 1.
        big = "spark " * 40_000
        df = spark.createDataFrame(
            [(0, big), (1, big), (2, "totally different words here")],
            "doc_id long, text string")
        tf = {(r["doc"], r["dim"]): r["c"]
              for r in C.hashed_tf(df, "doc_id", "text").collect()}
        assert max(tf.values()) <= C.TF_CAP
        pairs = {(r["doc_a"], r["doc_b"])
                 for r in C.semantic_pairs(df, "doc_id", "text").collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs


class TestTimeTravel:
    def test_pinned_version_excludes_later_commit_and_survives_compact(
            self, spark):
        import shutil
        import tempfile

        from fictional_guacamole_spark.sources.txnlog import (
            TransactionalParquetTable)
        base = tempfile.mkdtemp(prefix="fg_tt_test_")
        shutil.rmtree(base)
        try:
            t = TransactionalParquetTable(base)
            df = spark.range(30).select(
                F.col("id"), (F.col("id") % 3).alias("slice"))
            for i in range(3):
                t.commit(df.filter(F.col("slice") == i), f"s{i}")
            v2 = 2
            before = sorted(r["id"] for r in
                            t.read(spark, version=v2).collect())
            t.compact(spark, "opt")
            after = sorted(r["id"] for r in
                           t.read(spark, version=v2).collect())
            want = sorted(r["id"] for r in
                          df.filter(F.col("slice") < 2).collect())
            assert before == want
            assert after == want  # compaction must not disturb the pin
            assert t.read(spark).count() == 30
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestSchemaEvolutionRow:
    def test_head_evolves_and_time_travel_pins_old_schema(self, spark):
        # the judged row's two contracts, checked directly on its output:
        # the head read carries the widened schema (null-filled for
        # pre-evolution rows → a NULL status group exists), and the
        # time-traveled v1 column list has NO status column at all
        from fictional_guacamole_spark.plans import REGISTRY
        rows = REGISTRY["txnlog_schema_evolution_stats"].builder(
            spark, "/root/testdata/sf0.001").collect()
        assert all(r["v1_cols"] == "cents,okey" for r in rows)
        statuses = {r["status"] for r in rows}
        assert None in statuses  # pre-evolution rows null-filled
        assert len(statuses) > 1  # post-evolution rows keep real values
        # the null-status group is exactly the %2==0 slice of the fixture
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
        null_row = [r for r in rows if r["status"] is None][0]
        assert null_row["n_rows"] == n_even


class TestDedupThenAgg:
    def test_exactly_once_despite_doubled_input(self, spark):
        # the doubled replay must aggregate to the UN-doubled truth
        from fictional_guacamole_spark.tables import load_table
        rows = REGISTRY["stream_engine_dedup_then_agg"].builder(
            spark, SF_JUDGED).collect()
        assert rows
        total = sum(r["n_events"] for r in rows)
        ev = load_table(spark, SF_JUDGED, "events")
        import datetime
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        cutoff = max_ts - datetime.timedelta(hours=1)
        batch = ev.filter(
            F.window("ts", "1 hour")["end"] <= F.lit(cutoff)).count()
        assert total == batch  # doubled input counted exactly once


class TestChangeFeed:
    def test_feed_excludes_seed_and_tags_ops(self, spark):
        rows = REGISTRY["cdc_change_feed_orders"].builder(
            spark, SF_JUDGED).collect()
        assert rows
        by_op = {}
        for r in rows:
            by_op.setdefault(r["_op"], []).append(r)
        assert set(by_op) == {"u", "d"}
        # upserts carry values from commit 2 only (keys % 3 == 1)
        for r in by_op["u"]:
            assert r["_commit_version"] == 2
            assert r["okey"] % 3 == 1
            assert r["cust"] is not None and r["cents"] is not None
        # deletes are key-only tombstones from commit 3 (keys % 12 == 0)
        for r in by_op["d"]:
            assert r["_commit_version"] == 3
            assert r["okey"] % 12 == 0
            assert r["cust"] is None and r["cents"] is None
            assert r["status"] is None

    def test_applying_the_feed_reproduces_the_new_snapshot(self, spark):
        # the CDF consumer contract: old snapshot + feed == new snapshot
        import shutil
        import tempfile

        from fictional_guacamole_spark.sources.cdc import UpsertTable
        base = tempfile.mkdtemp(prefix="fg_cdf_apply_")
        shutil.rmtree(base)
        try:
            t = UpsertTable(base, keys=["k"])
            df = spark.range(40).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
            t.upsert(df.filter(F.col("k") < 20), "v1")
            v1 = 1
            t.upsert(df.filter((F.col("k") >= 10) & (F.col("k") < 30))
                     .withColumn("v", F.col("v") + 1), "v2")
            t.delete_keys(df.filter(F.col("k") % 5 == 0).select("k"), "v3")
            snap_v1 = {(r["k"], r["v"])
                       for r in t.read(spark, version=v1).collect()}
            snap_now = {(r["k"], r["v"]) for r in t.read(spark).collect()}
            # apply the feed to snap_v1: latest change per key wins
            feed = t.changes(spark, since_version=v1).collect()
            latest = {}
            for r in sorted(feed, key=lambda r: r["_commit_version"]):
                latest[r["k"]] = r
            applied = {k: v for k, v in snap_v1}
            for k, r in latest.items():
                if r["_op"] == "d":
                    applied.pop(k, None)
                else:
                    applied[k] = r["v"]
            assert set(applied.items()) == snap_now
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamChangeFeedApply:
    def test_streamed_replica_equals_source_head(self, spark):
        # the streamed-feed replica must equal the source table's head
        # snapshot (merge-on-read resolution) — same table, two paths
        from fictional_guacamole_spark.plans.curation import (
            _cdc_orders_feed_table)
        from fictional_guacamole_spark.sources.cdc import UpsertTable
        sf = "/root/testdata/sf0.001"
        got = {(r["okey"], r["cust"], r["cents"], r["status"])
               for r in REGISTRY["stream_engine_change_feed_apply"]
               .builder(spark, sf).collect()}
        base = _cdc_orders_feed_table(spark, sf)
        head = {(r["okey"], r["cust"], r["cents"], r["status"])
                for r in UpsertTable(base, keys=["okey"])
                .read(spark).collect()}
        assert got == head and got

    def test_deleted_keys_absent_seed_keys_present(self, spark):
        sf = "/root/testdata/sf0.001"
        rows = REGISTRY["stream_engine_change_feed_apply"].builder(
            spark, sf).collect()
        keys = {r["okey"] for r in rows}
        assert not any(k % 12 == 0 for k in keys)  # tombstones applied
        assert any(k % 3 == 0 for k in keys)       # v1 snapshot included
        assert any(k % 3 == 1 for k in keys)       # v2 feed applied
        # v2 rows carry VALUES (not null-filled) after the apply
        v2 = [r for r in rows if r["okey"] % 3 == 1]
        assert v2 and all(r["cents"] is not None for r in v2)


class TestTemperatureAllocProperties:
    """Hypothesis property suite for the shared Hamilton apportionment:
    the invariants that must hold for ANY domain-size profile, not just
    the fixtures'."""

    def test_random_profiles_respect_all_invariants(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=12, deadline=None)
        @given(st.lists(st.integers(min_value=1, max_value=400),
                        min_size=1, max_size=8))
        def check(sizes):
            rows = [(f"d{i}", n) for i, n in enumerate(sizes)]
            df = spark.createDataFrame(rows, "domain string, n_d long")
            alloc = {r["domain"]: r["alloc"]
                     for r in C.temperature_alloc(
                         df, "domain", budget_div=4).collect()}
            budget = sum(sizes) // 4
            by_dom = dict(rows)
            # every quota within its domain; total never over budget
            assert all(0 <= alloc[d] <= by_dom[d] for d in alloc)
            assert sum(alloc.values()) <= budget
            # when no quota clamps, Hamilton fills the budget exactly
            import math
            w = [math.isqrt(n) for n in sizes]
            ws = sum(w)
            unclamped = all((budget * wi) // ws + 1 <= ni
                            for wi, ni in zip(w, sizes))
            if unclamped:
                assert sum(alloc.values()) == budget

        check()

    def test_weighted_key_is_monotone_in_weight(self, spark):
        # adding draws can only LOWER the min — a doc's key is
        # non-increasing in its weight, the E-S coupling property that
        # makes bottom-k samples nested across weight scalings
        rows = [(i, w) for i in range(50) for w in (1, 4, 16, 64)]
        df = spark.createDataFrame(rows, "doc long, weight long")
        got = {(r["doc"], r["weight"]): r["k"] for r in df.select(
            "doc", "weight",
            C.weighted_sample_key(F.col("doc"), F.col("weight"))
            .alias("k")).collect()}
        for i in range(50):
            ks = [got[(i, w)] for w in (1, 4, 16, 64)]
            assert ks == sorted(ks, reverse=True) or \
                all(a >= b for a, b in zip(ks, ks[1:]))



class TestCascadeStage3VolumeInvariant:
    """r11 verdict task #6: 1-gram blocking collides ~63% of pairs by
    design (weakly selective on a shared vocabulary) — SAFE only because
    stage 3 sees the collapsed survivor set, never the corpus. Pin the
    assumption on a dup-saturated replica fixture so a future reordering
    of the cascade (or a survivor-set regression) fails loudly here
    rather than as an sf10 OOM."""

    def test_stage3_candidates_bounded_by_survivors(self, spark):
        from pyspark.sql import Window as W

        from fictional_guacamole_spark.functions import dedup as D
        from fictional_guacamole_spark.functions import text as X
        from fictional_guacamole_spark.tables import load_table

        base = (load_table(spark, "/root/testdata/sf0.001", "documents")
                .select("doc_id", "text"))
        # 10x replica corpus, the sf-sweep shape: odd replicas verbatim
        # (exact-stage food), even replicas tail-tagged (near-dup food)
        reps = [base]
        for r in range(1, 10):
            rid = (F.col("doc_id") + 100000 * r).alias("doc_id")
            if r % 2 == 1:
                reps.append(base.select(rid, "text"))
            else:
                reps.append(base.select(
                    rid, F.concat(F.col("text"),
                                  F.lit(f" replica tag {r}")).alias("text")))
        docs = reps[0]
        for rdf in reps[1:]:
            docs = docs.unionByName(rdf)
        docs = docs.localCheckpoint(eager=True)
        n_docs = docs.count()

        # stages 1-2 exactly as the cascade builder wires them
        fp = docs.select(F.col("doc_id").alias("doc"),
                         F.md5(X.normalize(F.col("text"))).alias("fp"))
        rep1 = fp.withColumn("exact_rep",
                             F.min("doc").over(W.partitionBy("fp")))
        s1 = (rep1.filter(F.col("doc") == F.col("exact_rep"))
              .select("doc"))
        s1_docs = docs.join(s1.select(F.col("doc").alias("doc_id")),
                            "doc_id")
        mh_pairs = (D.minhash_lsh_pairs(s1_docs, "doc_id", "text", n=3)
                    .filter(F.col("est_jaccard") >= 0.5)
                    .select("doc_a", "doc_b"))
        mh_comp = (D.dedup_components(mh_pairs, s1)
                   .localCheckpoint(eager=True))
        s2 = (mh_comp.filter(F.col("doc") == F.col("canonical_id"))
              .select("doc"))
        s2_docs = docs.join(s2.select(F.col("doc").alias("doc_id")),
                            "doc_id")

        def band_candidates(d) -> int:
            bk = D.minhash_band_keys(
                D.minhash_signatures(d, "doc_id", "text", n=1))
            return (bk.alias("x").join(
                        bk.alias("y"),
                        (F.col("x.band") == F.col("y.band"))
                        & (F.col("x.band_sig") == F.col("y.band_sig"))
                        & (F.col("x.doc") < F.col("y.doc")))
                    .select("x.doc", "y.doc").distinct().count())

        n_s2 = s2.count()
        cand3 = band_candidates(s2_docs)
        cand3_naive = band_candidates(docs)

        # measured at pin time: n=5000, s2=403 (8.1%), cand3=50 819
        # (126x s2, 63% of survivor pairs), naive=8 444 300 (166x more)
        assert n_s2 <= 0.10 * n_docs          # the collapse is real
        assert cand3 <= 150 * n_s2            # per-survivor fan-out const
        assert cand3 <= 0.75 * n_s2 * (n_s2 - 1) / 2   # ~63% collision
        assert cand3 * 50 <= cand3_naive      # >=50x cheaper than naive

"""Round-11 second-wave corpus operators (plans/corpus.py): exact-substring
dedup span semantics on hand-built corpora, UniMax water-filling invariants
(hypothesis property sweep + the judged row), and the LSH-blocking recall
audit's internal consistency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fictional_guacamole_spark.functions import curation as C
from fictional_guacamole_spark.functions import dedup as D
from fictional_guacamole_spark.plans import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"
SF_JUDGED = "/root/testdata/sf0.01"


def _summary(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.exact_substring_summary(df, "doc_id", "text")
    return {r["doc"]: (r["n_words"], r["n_dup_spans"], r["dup_words"],
                       r["max_span"]) for r in out.collect()}


class TestExactSubstring:
    def test_shared_span_reported_on_both_docs(self, spark):
        # an 8-word span shared verbatim between docs 1 and 2 (k=6):
        # positions 1..3 of doc 1 match -> merged span = words 1..8
        span = "alpha beta gamma delta epsilon zeta eta theta"
        got = _summary(spark, [
            (1, span + " tail one two three"),
            (2, "lead in words " + span),
            (3, "completely different text with no overlap at all here"),
        ])
        assert got[1] == (12, 1, 8, 8)
        assert got[2] == (11, 1, 8, 8)
        assert got[3] == (9, 0, 0, 0)

    def test_two_disjoint_spans_stay_separate(self, spark):
        s1 = "a b c d e f"          # 6 words, one k-gram
        s2 = "u v w x y z"
        got = _summary(spark, [
            (1, s1 + " filler00 filler01 filler02 " + s2),
            (2, s1 + " something else entirely goes here " + s2),
        ])
        # doc 1: spans [1,6] and [10,15] -> 2 spans, 12 dup words
        assert got[1] == (15, 2, 12, 6)

    def test_adjacent_matches_coalesce(self, spark):
        # doc 1 shares words 1..6 with doc 2 and words 7..12 with doc 3;
        # the two matched runs are ADJACENT in doc 1 and merge into one
        # removable span of 12
        s1 = "a b c d e f"
        s2 = "u v w x y z"
        got = _summary(spark, [
            (1, s1 + " " + s2),
            (2, s1 + " completely different tail of words"),
            (3, "another unrelated head of words " + s2),
        ])
        assert got[1] == (12, 1, 12, 12)

    def test_short_docs_and_within_doc_repeats_excluded(self, spark):
        got = _summary(spark, [
            (1, "tiny doc"),                        # < k words: no grams
            (2, "p q r s t u p q r s t u"),          # repeats only WITHIN
            (3, "totally unrelated words go here now"),
        ])
        assert got[1] == (2, 0, 0, 0)
        assert got[2] == (12, 0, 0, 0)   # cross-doc definition
        assert got[3] == (6, 0, 0, 0)

    def test_judged_row_matches_injected_duplication(self, spark):
        out = REGISTRY["dedup_exact_substring"].builder(
            spark, SF_JUDGED).collect()
        assert len(out) == 500
        dup = [r for r in out if r["n_dup_spans"] > 0]
        assert len(dup) > 0
        for r in out:
            assert 0 <= r["dup_words"] <= r["n_words"]
            assert r["max_span"] <= r["dup_words"]
            assert (r["n_dup_spans"] == 0) == (r["dup_words"] == 0)
            # every span is at least k words by construction
            if r["n_dup_spans"]:
                assert r["dup_words"] >= D.SUBSTR_K * r["n_dup_spans"]


class TestUnimax:
    def _alloc(self, spark, counts, epochs, budget_div):
        df = spark.createDataFrame(
            [(f"d{i:03d}", n) for i, n in enumerate(counts)],
            "domain string, n_d long")
        return C.unimax_alloc(df, "domain", epochs, budget_div).collect()

    def test_water_filling_invariants_swept(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=12, deadline=None)
        @given(st.lists(st.integers(min_value=1, max_value=500),
                        min_size=2, max_size=30),
               st.integers(min_value=1, max_value=4),
               st.integers(min_value=1, max_value=6))
        def check(counts, epochs, budget_div):
            rows = self._alloc(spark, counts, epochs, budget_div)
            total = sum(counts)
            budget = total // budget_div
            cap_sum = sum(r["cap_docs"] for r in rows)
            # exact budget exhaustion (or full saturation)
            assert sum(r["alloc"] for r in rows) == min(budget, cap_sum)
            # per-domain bounds
            for r in rows:
                assert 0 <= r["alloc"] <= r["cap_docs"]
                assert r["cap_docs"] == epochs * r["n_d"]
            # uncapped allocations are uniform to within 1
            unc = [r["alloc"] for r in rows if r["alloc"] < r["cap_docs"]]
            if unc:
                assert max(unc) - min(unc) <= 1
                # no saturated capacity may exceed the water level + 1
                # (otherwise it should not have saturated)
                level = min(unc)
                for r in rows:
                    if r["alloc"] == r["cap_docs"]:
                        assert r["cap_docs"] <= level + 1

        check()

    def test_judged_row_fairness_shape(self, spark):
        out = REGISTRY["pipeline_unimax_mix"].builder(
            spark, SF_JUDGED).collect()
        total = sum(r["n_docs"] for r in out)
        assert sum(r["alloc"] for r in out) == total // 2
        # the cap binds somewhere and the level binds somewhere
        assert any(r["epochs_bp"] == 20000 for r in out)
        assert any(r["epochs_bp"] < 20000 for r in out)


class TestRecallAudit:
    def test_rows_internally_consistent(self, spark):
        out = {r["bucket"]: r for r in
               REGISTRY["dedup_recall_audit"].builder(
                   spark, SF_JUDGED).collect()}
        assert "all_true" in out and "candidates" in out
        at, cd = out["all_true"], out["candidates"]
        # the same caught-pair count appears in both directions
        assert at["n_caught"] == cd["n_caught"]
        buckets = [v for k, v in out.items()
                   if k not in ("all_true", "candidates")]
        assert sum(b["n_pairs"] for b in buckets) == at["n_pairs"]
        assert sum(b["n_caught"] for b in buckets) == at["n_caught"]
        for r in out.values():
            assert 0 <= r["n_caught"] <= r["n_pairs"]
            assert r["rate_bp"] == (10000 * r["n_caught"]) // r["n_pairs"]


class TestTarShards:
    def _roundtrip(self, spark, tmp_path, rows, n_shards=3):
        from fictional_guacamole_spark.sources import tar_shards as T
        df = spark.createDataFrame(rows, "doc_id long, text string")
        base = str(tmp_path / "shards")
        T.write_tar_shards(df, base, n_shards)
        back = T.read_tar_shards(spark, base)
        return base, {r["member_id"]: (r["n_bytes"], r["text"])
                      for r in back.collect()}

    def test_content_roundtrips_bytes_exact(self, spark, tmp_path):
        rows = [(0, "plain ascii"), (1, "unicode é中文 text"),
                (2, ""), (3, "x" * 5000), (10, "sparse ids fine")]
        _, got = self._roundtrip(spark, tmp_path, rows)
        assert len(got) == len(rows)
        for doc_id, text in rows:
            n_bytes, back = got[doc_id]
            assert back == text
            assert n_bytes == len(text.encode("utf-8"))

    def test_shard_bytes_deterministic(self, spark, tmp_path):
        import hashlib
        import pathlib
        rows = [(i, f"document number {i} body") for i in range(20)]
        b1, _ = self._roundtrip(spark, tmp_path / "a", rows)
        b2, _ = self._roundtrip(spark, tmp_path / "b", rows)
        digest = lambda base: sorted(
            (p.name, hashlib.md5(p.read_bytes()).hexdigest())
            for p in pathlib.Path(base).glob("*.tar"))
        d1, d2 = digest(b1), digest(b2)
        assert d1 == d2
        assert len(d1) == 3

    def test_judged_row_covers_all_docs(self, spark):
        out = REGISTRY["tar_shard_roundtrip_doc_stats"].builder(
            spark, SF_JUDGED).collect()
        assert sum(r["n_docs"] for r in out) == 500
        assert len(out) == 8


class TestKmeans:
    def test_separated_clusters_recovered(self, spark):
        # two tight blobs far apart in 4-d quantized space; seeds are the
        # two smallest ids (one in each blob by construction)
        rows = []
        for i in range(6):          # blob A around (1000, 0, 0, 0)
            for d, q in enumerate([1000 + i, i, 0, 0]):
                rows.append((i * 2, d, q))          # even ids
        for i in range(6):          # blob B around (-1000, 500, 0, 0)
            for d, q in enumerate([-1000 - i, 500, i, 0]):
                rows.append((i * 2 + 1, d, q))      # odd ids
        qv = spark.createDataFrame(rows, "doc long, dim int, q long")
        assign = C.kmeans_rounds(qv, k=2, rounds=2).collect()
        by_cid = {}
        for r in assign:
            by_cid.setdefault(r["cid"], set()).add(r["doc"])
        assert len(by_cid) == 2
        parities = [{d % 2 for d in docs} for docs in by_cid.values()]
        assert sorted(parities, key=len) == [{0}, {1}] or \
            sorted(parities, key=min) == [{0}, {1}]

    def test_seed_vector_has_zero_distance_round1(self, spark):
        rows = [(d, dim, (d + 1) * (dim + 7)) for d in range(4)
                for dim in range(3)]
        qv = spark.createDataFrame(rows, "doc long, dim int, q long")
        assign = {r["doc"]: r for r in
                  C.kmeans_rounds(qv, k=4, rounds=1).collect()}
        for d in range(4):   # every doc IS a seed here -> dist 0 to itself
            assert assign[d]["dist"] == 0 and assign[d]["cid"] == d

    def test_judged_row_partitions_the_corpus(self, spark):
        out = REGISTRY["cluster_kmeans_embeddings"].builder(
            spark, SF_JUDGED).collect()
        assert sum(r["n_members"] for r in out) == 500
        assert all(r["inertia"] >= 0 for r in out)
        assert len(out) <= 8


class TestExactSubstringApply:
    def test_cleaned_text_fingerprint_exact(self, spark):
        import hashlib
        span = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [(1, span + " tail one two three"),
             (2, "lead in words " + span)],
            "doc_id long, text string")
        got = {r["doc"]: r for r in
               D.exact_substring_apply(df, "doc_id", "text").collect()}
        assert got[1]["kept_words"] == 4
        assert got[1]["clean_fp"] == hashlib.md5(
            b"tail one two three").hexdigest()
        assert got[2]["kept_words"] == 3
        assert got[2]["clean_fp"] == hashlib.md5(
            b"lead in words").hexdigest()

    def test_fully_duplicated_doc_becomes_empty(self, spark):
        import hashlib
        same = "one two three four five six seven"
        df = spark.createDataFrame(
            [(1, same), (2, same)], "doc_id long, text string")
        out = D.exact_substring_apply(df, "doc_id", "text").collect()
        for r in out:
            assert r["kept_words"] == 0
            assert r["clean_fp"] == hashlib.md5(b"").hexdigest()

    def test_apply_consistent_with_summary_on_fixture(self, spark):
        summ = {r["doc"]: r for r in
                REGISTRY["dedup_exact_substring"].builder(
                    spark, SF_JUDGED).collect()}
        appl = {r["doc"]: r for r in
                REGISTRY["dedup_exact_substring_apply"].builder(
                    spark, SF_JUDGED).collect()}
        assert summ.keys() == appl.keys()
        for doc, s in summ.items():
            a = appl[doc]
            assert a["kept_words"] == s["n_words"] - s["dup_words"]


class TestSemanticDecon:
    def test_exactly_the_probe_origins_flagged(self, spark):
        out = REGISTRY["pipeline_decontaminate_semantic"].builder(
            spark, SF_JUDGED).collect()
        assert len(out) == 500
        flagged = {r["doc"] for r in out if r["contaminated"]}
        # every 10th vector spawned a perturbed probe (cos ~0.99 with its
        # origin, near-orthogonal to everything else)
        assert flagged == {d for d in range(0, 5000)
                           if d % 10 == 0 and any(
                               r["doc"] == d for r in out)}
        for r in out:
            if r["contaminated"]:
                assert r["n_probe_hits"] == 1


class TestClusterBalancedSample:
    def test_quota_and_determinism(self, spark):
        rows1 = REGISTRY["pipeline_cluster_balanced_sample"].builder(
            spark, SF_JUDGED).collect()
        rows2 = REGISTRY["pipeline_cluster_balanced_sample"].builder(
            spark, SF_JUDGED).collect()
        assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
        by_cid = {}
        for r in rows1:
            by_cid.setdefault(r["cid"], []).append(r["rank"])
        for cid, ranks in by_cid.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 10
        docs = [r["doc"] for r in rows1]
        assert len(docs) == len(set(docs))


class TestCurationV2:
    def test_manifest_contract(self, spark):
        out = REGISTRY["pipeline_curation_corpus_v2"].builder(
            spark, SF_JUDGED).collect()
        assert len(out) > 0
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r)
            assert r["kept_words"] >= 20
        for lang, rows in by_lang.items():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(ranks) + 1))
        # no contaminated doc may appear (decon gate), and every pick is
        # a doc the span cleaner kept
        decon = {r["doc"] for r in
                 REGISTRY["pipeline_decontaminate_semantic"].builder(
                     spark, SF_JUDGED).collect() if r["contaminated"]}
        appl = {r["doc"]: r["kept_words"] for r in
                REGISTRY["dedup_exact_substring_apply"].builder(
                    spark, SF_JUDGED).collect()}
        for r in out:
            assert r["doc"] not in decon
            assert appl[r["doc"]] == r["kept_words"]


class TestPythonDataSource:
    def test_one_partition_per_shard_and_path_equality(self, spark, tmp_path):
        from fictional_guacamole_spark.sources import tar_shards as T
        from fictional_guacamole_spark.sources.pyds import (
            read_tar_shards_pyds)
        rows = [(i, f"doc {i} says unicode é {i*7}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        base = str(tmp_path / "shards")
        T.write_tar_shards(df, base, 4)
        pyds = read_tar_shards_pyds(spark, base)
        assert pyds.rdd.getNumPartitions() == 4   # one task per shard
        got_pyds = sorted(tuple(r) for r in pyds.collect())
        got_bf = sorted(tuple(r) for r in
                        T.read_tar_shards(spark, base).collect())
        assert got_pyds == got_bf                 # two paths, same rows
        assert len(got_pyds) == 40
        assert got_pyds[0][2].startswith("doc 0 says unicode é")

    def test_judged_row_matches_binaryfile_sibling(self, spark):
        a = sorted(tuple(r) for r in
                   REGISTRY["python_datasource_tar_stats"].builder(
                       spark, SF_JUDGED).collect())
        b = sorted(tuple(r) for r in
                   REGISTRY["tar_shard_roundtrip_doc_stats"].builder(
                       spark, SF_JUDGED).collect())
        assert a == b

    def test_streaming_source_matches_batch_sibling(self, spark):
        a = sorted(tuple(r) for r in
                   REGISTRY["stream_engine_pyds_tar_source"].builder(
                       spark, SF_JUDGED).collect())
        b = sorted(tuple(r) for r in
                   REGISTRY["python_datasource_tar_stats"].builder(
                       spark, SF_JUDGED).collect())
        assert a == b

    def test_writer_two_phase_commit_roundtrip(self, spark, tmp_path):
        import pathlib
        from fictional_guacamole_spark.sources.pyds import (
            TarShardDataSource, _register_by_value, read_tar_shards_pyds)
        _register_by_value(spark, TarShardDataSource)
        rows = [(i, f"member {i} body é") for i in range(30)]
        df = spark.createDataFrame(rows, "member_id long, text string")
        base = str(tmp_path / "written")
        (df.repartition(3, df.member_id % 3)
         .write.format("fg_tarshard").option("path", base)
         .mode("append").save())
        files = sorted(p.name for p in pathlib.Path(base).iterdir())
        assert len(files) == 3                      # one shard per task
        assert all(f.startswith("shard-") for f in files)  # no temps left
        back = {r["member_id"]: r["text"] for r in
                read_tar_shards_pyds(spark, base).collect()}
        assert back == dict(rows)

    def test_stream_reader_offsets_survive_restart(self, tmp_path, spark):
        # A query restart re-instantiates the reader with _polled back at
        # 0 while the engine's committed start offset is ahead; the r11
        # advisor's regression: latestOffset must never fall below the
        # start offsets the engine has shown the reader.
        from fictional_guacamole_spark.sources import tar_shards as T
        from fictional_guacamole_spark.sources.pyds import (
            TarShardStreamReader)
        rows = [(i, f"m {i}") for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        base = str(tmp_path / "restart_src")
        T.write_tar_shards(df, base, 4)
        fresh = TarShardStreamReader({"path": base})
        # engine restarts from a checkpoint at shard 3: it re-plans the
        # uncommitted batch first...
        parts = fresh.partitions({"shard": 3}, {"shard": 3})
        assert parts == []              # nothing uncommitted — empty plan
        # ...then polls. A naive counter would answer 1 (< 3, offsets
        # regress, shards 1-2 replayed as duplicates); the clamp answers 3.
        assert fresh.latestOffset()["shard"] >= 3
        # commit() also raises the floor
        fresh2 = TarShardStreamReader({"path": base})
        fresh2.commit({"shard": 4})
        assert fresh2.latestOffset()["shard"] == 4
        # and a backwards range can never slice negatively
        assert fresh2.partitions({"shard": 4}, {"shard": 2}) == []

    def test_stream_reader_clean_shutdown_recovery(self, tmp_path, spark):
        # r12 advisor, re-designed: after a CLEAN shutdown (last batch
        # fully committed at K) the recovered reader's first poll happens
        # before it has seen any engine offset — and the engine polls
        # latestOffset() before initialOffset() even on FRESH queries
        # (measured), so call order cannot distinguish the two. The paced
        # first answer ({"shard": 1}) may therefore reach the engine's
        # log while committed = K > 1; safety comes from partitions():
        # it learns K from the batch start AND slices from
        # max(start, floor), so a committed shard is never re-read, and
        # the NEXT poll resumes pacing at K+1.
        from fictional_guacamole_spark.sources import tar_shards as T
        from fictional_guacamole_spark.sources.pyds import (
            TarShardStreamReader)
        rows = [(i, f"m {i}") for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        base = str(tmp_path / "clean_restart_src")
        T.write_tar_shards(df, base, 4)
        recovered = TarShardStreamReader({"path": base})
        assert recovered.latestOffset()["shard"] == 1   # paced, virgin
        # the engine plans around the stale answer: start = committed 3
        assert recovered.partitions({"shard": 3}, {"shard": 1}) == []
        # a regressed engine log can never re-read below the floor...
        low = recovered.partitions({"shard": 1}, {"shard": 4})
        assert [p.path.rsplit("-", 1)[-1] for p in low] == ["00003.tar"]
        # ...and pacing resumes one past the taught floor
        assert recovered.latestOffset()["shard"] == 4
        # a genuinely fresh query paces one shard per micro-batch
        fresh = TarShardStreamReader({"path": base})
        assert fresh.initialOffset() == {"shard": 0}
        assert fresh.latestOffset()["shard"] == 1
        assert fresh.latestOffset()["shard"] == 2

    def test_writer_overwrite_clears_stale_shards(self, spark, tmp_path):
        # mode("overwrite") with fewer tasks than a prior run must not
        # leave the prior run's extra shards mixed into the output
        # (r11 advisor, ADVICE.md pyds.py:219).
        import pathlib
        from fictional_guacamole_spark.sources.pyds import (
            TarShardDataSource, _register_by_value, read_tar_shards_pyds)
        _register_by_value(spark, TarShardDataSource)
        base = str(tmp_path / "ow")
        big = spark.createDataFrame(
            [(i, f"old {i}") for i in range(40)],
            "member_id long, text string")
        (big.repartition(4, big.member_id % 4)
         .write.format("fg_tarshard").option("path", base)
         .mode("append").save())
        assert len(list(pathlib.Path(base).glob("shard-*.tar"))) == 4
        small = spark.createDataFrame(
            [(i, f"new {i}") for i in range(10)],
            "member_id long, text string")
        (small.repartition(2, small.member_id % 2)
         .write.format("fg_tarshard").option("path", base)
         .mode("overwrite").save())
        assert len(list(pathlib.Path(base).glob("shard-*.tar"))) == 2
        back = {r["member_id"]: r["text"] for r in
                read_tar_shards_pyds(spark, base).collect()}
        assert back == {i: f"new {i}" for i in range(10)}

    def test_writer_rejects_wrong_schema(self, spark, tmp_path):
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException
        from fictional_guacamole_spark.sources.pyds import (
            TarShardDataSource, _register_by_value)
        _register_by_value(spark, TarShardDataSource)
        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises((Py4JJavaError, PythonException, Exception)):
            (df.write.format("fg_tarshard")
             .option("path", str(tmp_path / "bad")).mode("append").save())

    def test_stream_sink_rerun_is_byte_identical(self, spark, tmp_path):
        import hashlib
        import pathlib
        import tempfile
        import shutil
        from fictional_guacamole_spark.sources import tar_shards as T
        from fictional_guacamole_spark.sources.pyds import (
            TarShardSinkDataSource, _register_by_value,
            read_tar_shards_stream)
        rows = [(i, f"sinked member {i}") for i in range(24)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        src = str(tmp_path / "src")
        T.write_tar_shards(df, src, 3)
        _register_by_value(spark, TarShardSinkDataSource)

        def run(out):
            ckpt = tempfile.mkdtemp(prefix="fg_sinktest_ckpt_")
            q = (read_tar_shards_stream(spark, src)
                 .select("member_id", "text")
                 .writeStream.format("fg_tarshard_sink")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                shutil.rmtree(ckpt, ignore_errors=True)
            return sorted((p.name,
                           hashlib.md5(p.read_bytes()).hexdigest())
                          for p in pathlib.Path(out).glob("*.tar"))

        d1 = run(str(tmp_path / "out1"))
        d2 = run(str(tmp_path / "out2"))   # full replay, fresh checkpoint
        assert d1 == d2                    # same epoch shards, same bytes
        assert len(d1) >= 3                # >= one published shard/epoch
        assert all(n.startswith("epoch-") for n, _ in d1)

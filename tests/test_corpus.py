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

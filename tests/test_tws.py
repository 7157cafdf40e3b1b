"""transformWithStateInPandas surface (streaming/tws.py): the pure
watermark fold is tested directly and property-checked against the batch
T5 oracle; the live TWS integration runs only where protobuf exists
(absent in this container — see the module docstring)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fictional_guacamole_spark.streaming.tws import merge_sequence_batch


class TestMergeFold:
    def test_initializes_silently(self):
        assert merge_sequence_batch(None, 0, [7]) == (7, 0)

    def test_counts_gap(self):
        assert merge_sequence_batch(None, 0, [1, 2, 5]) == (5, 2)

    def test_carries_state_across_batches(self):
        st1 = merge_sequence_batch(None, 0, [1, 2])
        st2 = merge_sequence_batch(*st1, [5, 6])
        assert st2 == (6, 2)

    def test_ignores_late_and_duplicate_ids(self):
        assert merge_sequence_batch(10, 3, [4, 10, 11]) == (11, 3)

    def test_out_of_order_arrival_is_late_not_gap(self):
        # arrival order [3, 1]: 3 initializes, 1 is late — no gap.
        # (sorting the batch would wrongly report id 2 missing)
        assert merge_sequence_batch(None, 0, [3, 1]) == (3, 0)

    @given(st.lists(st.integers(1, 500), min_size=1, max_size=60),
           st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_batch_split_invariance_and_total(self, seqs, n_splits):
        """Folding any chunking of the arrival stream must equal the
        single-shot fold (micro-batch boundaries are invisible), and the
        missing count must match an independent set-based oracle."""
        single = merge_sequence_batch(None, 0, seqs)
        state = (None, 0)
        chunk = max(1, len(seqs) // n_splits)
        for i in range(0, len(seqs), chunk):
            state = merge_sequence_batch(*state, seqs[i:i + chunk])
        assert state == single
        # independent oracle: every id in (first, final_max] is missing
        # unless it arrived as a strict watermark advance — late ids never
        # retro-fill (the backfill path owns repairs, not the watermark)
        first = seqs[0]
        hi = first
        advanced = set()
        for s in seqs[1:]:
            if s > hi:
                advanced.add(s)
                hi = s
        assert state == (hi, (hi - first) - len(advanced))


class TestStreamingIntegration:
    def test_sequence_watermark_stream(self, spark, tmp_path):
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithStateInPandas needs protobuf (absent here)")
        from fictional_guacamole_spark.streaming.tws import (
            sequence_watermark_stream)
        d = str(tmp_path / "data")
        spark.createDataFrame(
            [("A", 1), ("A", 2), ("A", 5), ("B", 10)],
            "product_id string, seq long",
        ).coalesce(1).write.mode("overwrite").parquet(d)
        stream = (spark.readStream
                  .schema("product_id string, seq long")
                  .option("maxFilesPerTrigger", "1").parquet(d))
        out = sequence_watermark_stream(stream)
        q = (out.writeStream.format("memory").queryName("tws_gap")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ckpt")).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = {r["product_id"]: (r["max_seen"], r["n_missing_total"])
                for r in spark.table("tws_gap").collect()}
        assert rows == {"A": (5, 2), "B": (10, 0)}

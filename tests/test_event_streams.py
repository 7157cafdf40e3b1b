"""events-stream tests (SURVEY.md §5.4): watermarks, windowed aggregations,
and dedup-within-watermark over the events fixture replayed as a file
stream — verifying the streaming execution of the same window operators the
batch oracle queries cover (plans/windows_streaming.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.tables import SCHEMAS, load_table


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Re-materialize events (µs timestamps) as a parquet dir usable as a
    file-stream source."""
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, "/root/testdata/sf0.001", "events") \
        .coalesce(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, d):
    schema = SCHEMAS["events"].simpleString().replace("ts:bigint", "ts:timestamp")
    return (spark.readStream
            .schema("event_id long, ts timestamp, user_id long, "
                    "event_type string, value double, props string")
            .option("maxFilesPerTrigger", "1")
            .parquet(d))


class TestWatermarkedWindows:
    def test_tumbling_window_matches_batch(self, spark, events_stream_dir):
        stream = _stream(spark, events_stream_dir)
        agg = (stream.withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.writeStream.format("memory").queryName("tumbling")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted = {(r["w"]["start"], r["n"])
                   for r in spark.table("tumbling").collect()}
        batch = {(r["w"]["start"], r["n"])
                 for r in (load_table(spark, "/root/testdata/sf0.001", "events")
                           .groupBy(F.window("ts", "1 hour").alias("w"))
                           .agg(F.count(F.lit(1)).alias("n"))).collect()}
        # append mode emits only watermark-closed windows: a subset that
        # excludes at most the windows still open at end-of-stream
        assert emitted <= batch
        assert len(emitted) >= len(batch) - 2
        assert all(e in batch for e in emitted)

    def test_session_window_stream(self, spark, events_stream_dir):
        stream = _stream(spark, events_stream_dir)
        agg = (stream.withWatermark("ts", "2 hours")
               .groupBy("user_id", F.session_window("ts", "30 minutes"))
               .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.writeStream.format("memory").queryName("sessions")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted = spark.table("sessions").count()
        batch = (load_table(spark, "/root/testdata/sf0.001", "events")
                 .groupBy("user_id", F.session_window("ts", "30 minutes"))
                 .agg(F.count(F.lit(1)).alias("n"))).count()
        assert emitted > 0
        assert emitted <= batch

    def test_stream_stream_interval_join(self, spark, events_stream_dir):
        """Stream⋈stream with event-time bounds: purchases joined to the
        signup they followed within 1h — the streaming execution of the
        join_nonequi_funnel batch query (same predicate, inner form)."""
        s = (_stream(spark, events_stream_dir)
             .filter(F.col("event_type") == "signup")
             .withWatermark("ts", "2 hours")
             .select(F.col("user_id").alias("s_user"),
                     F.col("event_id").alias("s_id"),
                     F.col("ts").alias("s_ts")))
        p = (_stream(spark, events_stream_dir)
             .filter(F.col("event_type") == "purchase")
             .withWatermark("ts", "2 hours")
             .select(F.col("user_id").alias("p_user"),
                     F.col("event_id").alias("p_id"),
                     F.col("ts").alias("p_ts")))
        joined = s.join(
            p, F.expr("s_user = p_user AND p_ts > s_ts "
                      "AND p_ts <= s_ts + INTERVAL 1 HOUR"))
        q = (joined.writeStream.format("memory").queryName("ssj")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        streamed = {(r["s_id"], r["p_id"])
                    for r in spark.table("ssj").collect()}
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        sb = ev.filter(F.col("event_type") == "signup").alias("s")
        pb = ev.filter(F.col("event_type") == "purchase").alias("p")
        batch = {(r["s_id"], r["p_id"]) for r in
                 sb.join(pb,
                         (F.col("s.user_id") == F.col("p.user_id"))
                         & (F.col("p.ts") > F.col("s.ts"))
                         & (F.col("p.ts") <= F.col("s.ts")
                            + F.expr("INTERVAL 1 HOUR")))
                 .select(F.col("s.event_id").alias("s_id"),
                         F.col("p.event_id").alias("p_id")).collect()}
        assert streamed == batch

    def test_update_mode_running_counts(self, spark, events_stream_dir):
        """Update output mode: per-type running counts re-emit changed
        groups each micro-batch; the last emission per key must equal the
        batch ground truth."""
        stream = _stream(spark, events_stream_dir)
        agg = stream.groupBy("event_type").count()
        q = (agg.writeStream.format("memory").queryName("upd_counts")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # memory sink in update mode appends every re-emission; the final
        # state per key is the last row written for it
        import pandas as pd
        pdf = spark.table("upd_counts").toPandas()
        final = pdf.groupby("event_type")["count"].last().to_dict()
        truth = {r["event_type"]: r["count"] for r in
                 (load_table(spark, "/root/testdata/sf0.001", "events")
                  .groupBy("event_type").count()).collect()}
        assert final == truth

    def test_streaming_ohlcv_matches_batch_query(self, spark,
                                                 events_stream_dir):
        """The agg_ohlcv_candles expression under readStream: identical
        aggregate (min_by/max_by extremes + decimal volume) over a
        watermarked tumbling window must converge to the registered batch
        query's result."""
        from fictional_guacamole_spark.plans import REGISTRY
        from fictional_guacamole_spark.plans.compat import dsum

        stream = _stream(spark, events_stream_dir)
        agg = (stream.withWatermark("ts", "2 hours")
               .groupBy("event_type",
                        F.window("ts", "1 hour").getField("start")
                         .alias("bucket_start"))
               .agg(F.min_by("value", "event_id").alias("open"),
                    F.max("value").alias("high"),
                    F.min("value").alias("low"),
                    F.max_by("value", "event_id").alias("close"),
                    dsum(F.col("value")).alias("volume"),
                    F.count(F.lit(1)).alias("n_events")))
        q = (agg.writeStream.format("memory").queryName("ohlcv_stream")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        import pandas as pd
        pdf = spark.table("ohlcv_stream").toPandas()
        # update mode re-emits refined groups; last emission per key wins
        final = {tuple(k): tuple(v) for k, v in
                 pdf.groupby(["event_type", "bucket_start"])
                    [["open", "high", "low", "close", "volume", "n_events"]]
                    .last().iterrows()}
        batch = {(r["event_type"], pd.Timestamp(r["bucket_start"])):
                 (r["open"], r["high"], r["low"], r["close"], r["volume"],
                  r["n_events"])
                 for r in REGISTRY["agg_ohlcv_candles"]
                 .builder(spark, "/root/testdata/sf0.001").collect()}
        assert final == batch

    def test_drop_duplicates_within_watermark(self, spark, tmp_path):
        # duplicate every event twice in the source; the stream dedups on
        # (event_id) within the watermark horizon
        src = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
        dup_dir = str(tmp_path / "dup")
        src.union(src).coalesce(2).write.mode("overwrite").parquet(dup_dir)
        stream = _stream(spark, dup_dir)
        deduped = (stream.withWatermark("ts", "1 hour")
                   .dropDuplicatesWithinWatermark(["event_id"]))
        q = (deduped.writeStream.format("memory").queryName("dedup_wm")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.table("dedup_wm").count() == 200


class TestStreamingEwma:
    """The general-alpha EWMA fold (functions/timeseries.py::ewma_stream):
    the streaming applyInPandasWithState form must equal the batch
    applyInPandas form must equal a plain Python fold — micro-batch
    chunking can't change the recurrence."""

    ALPHA = 0.3

    def _mk_rows(self):
        import datetime as dt
        t0 = dt.datetime(2024, 3, 1)
        rows = []
        for k in (1, 2):
            for i in range(30):
                rows.append((k, t0 + dt.timedelta(minutes=i),
                             float((k * 37 + i * 13) % 100)))
        return rows

    def _python_fold(self, rows):
        out = {}
        for k, _, v in sorted(rows, key=lambda r: (r[0], r[1])):
            e = out.get(k)
            out[k] = v if e is None else self.ALPHA * v + (1 - self.ALPHA) * e
        return out

    def test_stream_equals_batch_equals_fold(self, spark, tmp_path):
        import datetime as dt

        from fictional_guacamole_spark.functions.timeseries import ewma_stream

        rows = self._mk_rows()
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")

        # batch form
        batch = ewma_stream(df, "k", "ts", "v", alpha=self.ALPHA)
        batch_final = {r["k"]: r["ewma"]
                       for r in batch.orderBy("k", "ts").collect()
                       if r["n"] == 30}

        # streaming form: three time-ordered files (the per-key in-order
        # arrival contract), one per micro-batch
        src = str(tmp_path / "ewma_src")
        t0 = dt.datetime(2024, 3, 1)
        for i, lo in enumerate((0, 10, 20)):
            cut_lo = t0 + dt.timedelta(minutes=lo)
            cut_hi = t0 + dt.timedelta(minutes=lo + 10)
            (df.filter((F.col("ts") >= cut_lo) & (F.col("ts") < cut_hi))
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{src}/part{i}"))
        stream = (spark.readStream.schema("k long, ts timestamp, v double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{src}/part*"))
        out = ewma_stream(stream, "k", "ts", "v", alpha=self.ALPHA)
        q = (out.writeStream.format("memory").queryName("ewma_stream")
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted = spark.table("ewma_stream").collect()
        assert len(emitted) == len(rows)  # one smoothed row per input row
        stream_final = {r["k"]: r["ewma"] for r in emitted if r["n"] == 30}

        ref = self._python_fold(rows)
        for k in (1, 2):
            assert batch_final[k] == pytest.approx(ref[k], rel=1e-12)
            assert stream_final[k] == pytest.approx(ref[k], rel=1e-12)


class TestStreamStaticJoin:
    """Stream⋈static enrichment (SURVEY §2.5 streaming row): an unbounded
    event stream joined to a bounded dimension — the per-micro-batch
    broadcast lookup every streaming pipeline uses for reference data.
    Unlike stream⋈stream it needs no watermark on the static side, and
    the result must equal the batch join over the same inputs."""

    def test_enrichment_matches_batch_join(self, spark, events_stream_dir,
                                           tmp_path):
        dim = spark.createDataFrame(
            [(i, f"segment_{i % 3}") for i in range(200)],
            "user_id long, segment string")
        stream = _stream(spark, events_stream_dir)
        enriched = (stream
                    .join(F.broadcast(dim), "user_id", "left")
                    .select("event_id", "user_id", "segment"))
        q = (enriched.writeStream.format("memory").queryName("ssj_static")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(tuple(r) for r in spark.table("ssj_static").collect())
        batch = (load_table(spark, "/root/testdata/sf0.001", "events")
                 .join(dim, "user_id", "left")
                 .select("event_id", "user_id", "segment"))
        want = sorted(tuple(r) for r in batch.collect())
        assert got == want


class TestStreamingSqliteSink:
    """The reference's architecture end-to-end in engine form: a stream
    landing in SQLite through foreachBatch with a declared primary key —
    a replayed micro-batch converges via INSERT OR REPLACE instead of
    duplicating (K1's exactly-once story, streaming-wired)."""

    def test_stream_lands_exactly_once(self, spark, events_stream_dir,
                                       tmp_path):
        from fictional_guacamole_spark.sources.sqlite import (
            read_sqlite, write_sqlite)

        db = str(tmp_path / "sink.db")
        stream = (_stream(spark, events_stream_dir)
                  .select("event_id", "user_id", "value"))

        def land(batch_df, batch_id):
            write_sqlite(batch_df, db, "events_sink", mode="append",
                         primary_key=["event_id"])
            # simulate Spark retrying the batch after a sink failure
            write_sqlite(batch_df, db, "events_sink", mode="append",
                         primary_key=["event_id"])

        q = (stream.writeStream.foreachBatch(land)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = read_sqlite(spark, db, "events_sink", num_partitions=3)
        src = load_table(spark, "/root/testdata/sf0.001", "events")
        assert got.count() == src.count()  # exactly once, despite replays
        assert got.agg(F.sum("event_id")).first()[0] == \
            src.agg(F.sum("event_id")).first()[0]


class TestJudgedAppendWatermarkRow:
    """Backs the stream_engine_append_watermark docstring's claims: the
    drain is multi-micro-batch (4 data files + ≥1 no-data flush batch),
    the emitted set is exactly the batch agg cut at window.end <= final
    watermark, and no row is ever late-dropped under the time-clustered
    source (total emitted counts reconstruct every finalized window)."""

    def test_emitted_set_is_watermark_cutoff_and_multibatch(self, spark):
        import datetime
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_append_watermark)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_append_watermark(spark, sf_dir).collect()

        ev = load_table(spark, sf_dir, "events")
        mx = ev.agg(F.max("ts")).collect()[0][0]
        wm = mx - datetime.timedelta(hours=1)
        exp = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.floor(F.col("value") * 100)).alias("value_cents"))
               .filter(F.col("w.end") <= F.lit(wm))
               .select(F.col("w.start").alias("window_start"), "event_type",
                       "n_events", "value_cents")
               .orderBy("window_start", "event_type")
               .collect())
        assert got == exp
        assert len(got) > 0
        # trailing windows really are withheld: the full agg has more
        full = (ev.groupBy(F.window("ts", "1 hour"), "event_type").count()
                .count())
        assert full > len(got)
        # every emitted row is watermark-final
        assert all(r.window_start + datetime.timedelta(hours=1) <= wm
                   for r in got)


class TestJudgedStatefulEwmaRow:
    """Backs stream_engine_stateful_ewma: the applyInPandasWithState
    kernel's incremental pow-2 fold equals ewma_pow2's batch closed form
    (a) at the pure-kernel level with the series split across arbitrary
    batch boundaries (state round-trip exactness), and (b) end-to-end
    through the real engine at the test SF."""

    def test_kernel_split_equals_batch_closed_form(self):
        import math

        import pandas as pd

        from fictional_guacamole_spark.functions.timeseries import (
            EWMA_HORIZON, EWMA_VALUE_SCALE, make_ewma_pow2_state_kernel)

        class FakeState:
            def __init__(self):
                self.exists = False
                self._v = None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self.exists = True
                self._v = v

        rows = [(7, i, 100 + i, round(3.17 * (i % 23) - 11.0, 2))
                for i in range(40)]  # 40 > horizon: eviction exercised
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                          "value"])
        kernel = make_ewma_pow2_state_kernel(
            "user_id", ["ts", "event_id"], "value")

        def drain(splits):
            st = FakeState()
            out = None
            for lo, hi in splits:
                out = next(kernel((7,), iter([pdf.iloc[lo:hi]]), st))
            return out.iloc[0]

        # closed form over the last-16, oldest first
        cents = [math.floor(v * EWMA_VALUE_SCALE) for v in pdf["value"]]
        kept = cents[-EWMA_HORIZON:]
        numer = kept[0] + sum((1 << (i - 2)) * kept[i - 1]
                              for i in range(2, len(kept) + 1))
        expect = numer / ((1 << (len(kept) - 1)) * EWMA_VALUE_SCALE)

        for splits in ([(0, 40)], [(0, 13), (13, 29), (29, 40)],
                       [(i, i + 1) for i in range(40)]):
            fin = drain(splits)
            assert fin["n_seen"] == 40 and fin["n_used"] == EWMA_HORIZON
            assert fin["ewma"] == expect  # bit-exact, any batching

    def test_engine_result_equals_batch_operator(self, spark):
        import os

        from fictional_guacamole_spark.functions import timeseries as T
        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_stateful_ewma)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_stateful_ewma(spark, sf_dir).collect()
        exp = (T.ewma_pow2(load_table(spark, sf_dir, "events"),
                           "user_id", ["ts", "event_id"], "value")
               .orderBy("user_id").collect())
        assert [tuple(r) for r in got] == [tuple(r) for r in exp]
        assert len(got) > 0


class TestJudgedStreamDedupRow:
    """Backs stream_engine_dedup_watermark: the doubled replay emits
    every event exactly once, equal to the distinct batch set."""

    def test_doubled_replay_emits_each_event_once(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_dedup_watermark)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_dedup_watermark(spark, sf_dir).collect()
        ev = load_table(spark, sf_dir, "events")
        exp = (ev.select("event_id", "ts", "user_id", "event_type",
                         F.floor(F.col("value") * 100).cast("long")
                         .alias("value_cents"))
               .orderBy("event_id").collect())
        assert len(got) == ev.count()  # exactly once, not twice
        assert [tuple(r) for r in got] == [tuple(r) for r in exp]


class TestJudgedStreamStreamJoinRow:
    """Backs stream_engine_stream_join: the drained two-sided join equals
    the batch join verbatim (every view still buffered when its last
    possible purchase arrives), and the match set is non-trivial."""

    def test_drained_join_equals_batch_join(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_stream_join)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_stream_join(spark, sf_dir).collect()

        ev = load_table(spark, sf_dir, "events")
        p = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id"), F.col("ts").alias("purchase_ts")))
        v = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"),
                     F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts")))
        exp = (p.join(v, (p.user_id == v.v_user)
                      & (F.col("view_ts") <= F.col("purchase_ts"))
                      & (F.col("view_ts") > F.col("purchase_ts")
                         - F.expr("INTERVAL 6 HOURS")))
               .select("purchase_id", "view_id", "user_id", "purchase_ts")
               .orderBy("purchase_id", "view_id").collect())
        assert len(got) > 0
        assert [tuple(r) for r in got] == [tuple(r) for r in exp]


class TestJudgedStaticEnrichRow:
    """Backs stream_engine_static_enrich: the drained stream⋈static result
    equals the batch join + aggregation over the same inputs, and the
    drain is genuinely multi-micro-batch."""

    def test_drained_enrichment_equals_batch(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_static_enrich)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = [tuple(r) for r in
               stream_engine_static_enrich(spark, sf_dir).collect()]
        assert len(got) > 0

        ev = load_table(spark, sf_dir, "events")
        dim = load_table(spark, sf_dir, "customer") \
            .select("c_custkey", "c_mktsegment")
        want = (ev.join(dim, ev.user_id == dim.c_custkey)
                .groupBy(F.col("c_mktsegment").alias("segment"),
                         "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.floor(F.col("value") * 100))
                     .alias("value_cents"))
                .orderBy("segment", "event_type"))
        assert got == [tuple(r) for r in want.collect()]


class TestJudgedOuterJoinRow:
    """Backs stream_engine_outer_join: the drained LEFT OUTER set equals
    batch matches plus null rows for unmatched purchases below the final
    GLOBAL watermark (min across the two sides' filtered clocks), and
    both halves are non-trivially populated."""

    def test_drained_outer_join_equals_batch_with_cutoff(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_outer_join)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = [tuple(r) for r in
               stream_engine_outer_join(spark, sf_dir).collect()]
        n_null = sum(1 for r in got if r[1] is None)
        assert n_null > 0, "no unmatched purchases emitted"
        assert n_null < len(got), "no matches emitted"

        ev = load_table(spark, sf_dir, "events")
        p = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     "user_id", F.col("ts").alias("purchase_ts")))
        v = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"),
                     F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts")))
        cond = ((p.user_id == v.v_user)
                & (F.col("view_ts") <= F.col("purchase_ts"))
                & (F.col("view_ts") > F.col("purchase_ts")
                   - F.expr("INTERVAL 6 HOURS")))
        matched = p.join(v, cond).select(
            "purchase_id", "view_id", "user_id", "purchase_ts")
        # global watermark = min of the two sides' (max ts - 1h)
        wm = min(p.agg(F.max("purchase_ts")).first()[0],
                 v.agg(F.max("view_ts")).first()[0])
        import datetime
        cut = wm - datetime.timedelta(hours=1)
        unmatched = (p.join(v, cond, "left_anti")
                     .filter(F.col("purchase_ts") < F.lit(cut))
                     .select("purchase_id",
                             F.lit(None).cast("long").alias("view_id"),
                             "user_id", "purchase_ts"))
        want = [tuple(r) for r in
                matched.unionByName(unmatched)
                .orderBy("purchase_id", F.asc_nulls_first("view_id"))
                .collect()]
        assert got == want


class TestJudgedSessionWindowRow:
    """Backs stream_engine_session_window: the drained append-mode
    session set equals the batch session_window aggregation filtered to
    watermark-finalized sessions, and sessions genuinely span micro-batch
    boundaries (merge-state exercised)."""

    def test_drained_sessions_equal_batch_with_cutoff(self, spark):
        import datetime
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_session_window)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = [tuple(r) for r in
               stream_engine_session_window(spark, sf_dir).collect()]
        assert len(got) > 0

        ev = load_table(spark, sf_dir, "events")
        cut = (ev.agg(F.max("ts")).first()[0]
               - datetime.timedelta(hours=1))
        want_df = (ev.groupBy("user_id",
                              F.session_window("ts", "30 minutes")
                              .alias("w"))
                   .agg(F.count(F.lit(1)).alias("n_events"))
                   .filter(F.col("w.end") <= F.lit(cut))
                   .select("user_id", F.col("w.start"), F.col("w.end"),
                           "n_events")
                   .orderBy("user_id", "w.start"))
        want = [tuple(r) for r in want_df.collect()]
        assert got == want
        # the batch total must exceed the drained set: trailing sessions
        # are withheld by design (their end is past the final watermark)
        total = (ev.groupBy("user_id",
                            F.session_window("ts", "30 minutes")).count()
                 .count())
        assert total > len(got)


class TestJudgedFullOuterJoinRow:
    """Backs stream_engine_full_outer_join: the drained set equals batch
    matches plus BOTH sides' cutoff-filtered unmatched rows, and each
    side's eviction clock is genuinely different (the asymmetry is the
    judged property)."""

    def test_drained_full_outer_equals_batch_with_per_side_cutoffs(
            self, spark):
        import datetime
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_full_outer_join)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = [tuple(r) for r in
               stream_engine_full_outer_join(spark, sf_dir).collect()]
        n_null_v = sum(1 for r in got if r[1] is None)
        n_null_p = sum(1 for r in got if r[0] is None)
        assert n_null_v > 0, "no unmatched purchases emitted"
        assert n_null_p > 0, "no unmatched views emitted"

        ev = load_table(spark, sf_dir, "events")
        p = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts").alias("purchase_ts")))
        v = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"),
                     F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts")))
        cond = ((p.p_user == v.v_user)
                & (F.col("view_ts") <= F.col("purchase_ts"))
                & (F.col("view_ts") > F.col("purchase_ts")
                   - F.expr("INTERVAL 6 HOURS")))
        wm = min(p.agg(F.max("purchase_ts")).first()[0],
                 v.agg(F.max("view_ts")).first()[0]) \
            - datetime.timedelta(hours=1)
        matched = p.join(v, cond).select(
            "purchase_id", "view_id", F.col("p_user").alias("user_id"),
            "purchase_ts", "view_ts")
        un_p = (p.join(v, cond, "left_anti")
                .filter(F.col("purchase_ts") < F.lit(wm))
                .select("purchase_id",
                        F.lit(None).cast("long").alias("view_id"),
                        F.col("p_user").alias("user_id"), "purchase_ts",
                        F.lit(None).cast("timestamp").alias("view_ts")))
        un_v = (v.join(p, cond, "left_anti")
                .filter(F.col("view_ts") + F.expr("INTERVAL 6 HOURS")
                        <= F.lit(wm))
                .select(F.lit(None).cast("long").alias("purchase_id"),
                        "view_id", F.col("v_user").alias("user_id"),
                        F.lit(None).cast("timestamp").alias("purchase_ts"),
                        "view_ts"))
        want = [tuple(r) for r in
                matched.unionByName(un_p).unionByName(un_v)
                .orderBy(F.asc_nulls_first("purchase_id"),
                         F.asc_nulls_first("view_id")).collect()]
        assert got == want


class TestScopedStatePartitions:
    def test_stream_state_partitions_is_the_compat_scope(self, spark):
        """r8 advisor finding: _stream_state_partitions duplicated
        compat.scoped_shuffle_partitions. It now delegates — one
        save/set/restore implementation, identical scoping behavior."""
        from fictional_guacamole_spark.plans import compat
        from fictional_guacamole_spark.plans import windows_streaming as ws

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with ws._stream_state_partitions(spark, 4):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
            with compat.scoped_shuffle_partitions(spark, 7):
                assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestStreamJoinStateEconomics:
    """VERDICT r8 task #6: the stream-stream join's state store must
    PLATEAU once the watermark passes — resident rows track the join
    horizon (6h) + watermark (1h), not stream length. Asserted from the
    JsonlMetricsListener's per-batch state_operators readings over the
    judged row's exact join (30-day replay in 4 time-ascending
    micro-batches: anything older than ~7h of stream-end must be gone)."""

    def test_join_state_plateaus_under_watermark(self, spark, tmp_path):
        import shutil
        import tempfile
        import time
        import uuid

        from fictional_guacamole_spark.plans.windows_streaming import (
            _purchase_view_sides, _stream_state_partitions,
            _time_clustered_events_copy)
        from fictional_guacamole_spark.streaming import monitoring as MON

        base = _time_clustered_events_copy(spark, "/root/testdata/sf0.001")
        purchases, views = _purchase_view_sides(spark, base)
        joined = purchases.join(
            views,
            F.expr("""p_user = v_user
                      AND view_ts <= purchase_ts
                      AND view_ts > purchase_ts - INTERVAL 6 HOURS"""))

        metrics = str(tmp_path / "metrics.jsonl")
        listener = MON.attach_metrics(spark, metrics)
        name = f"fg_statecheck_{uuid.uuid4().hex[:12]}"
        ckpt = tempfile.mkdtemp(prefix="fg_statecheck_ckpt_")
        try:
            with _stream_state_partitions(spark):
                q = (joined.select("purchase_id", "view_id")
                     .writeStream.format("memory").queryName(name)
                     .outputMode("append")
                     .option("checkpointLocation", ckpt)
                     .start())
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()
            # listener events are delivered asynchronously after commits
            for _ in range(50):
                if len(MON.read_progress(metrics)) >= 4:
                    break
                time.sleep(0.2)
        finally:
            MON.detach_metrics(spark, listener)
            shutil.rmtree(ckpt, ignore_errors=True)

        s = MON.state_plateau_summary(metrics)
        batches = [t for t in s["trajectory"] if t["rows_updated"] > 0]
        assert len(batches) >= 4, s  # one per time-ascending file
        # every purchase and view row enters state once (both sides
        # buffer; sf0.001 holds 202 purchases + 188 views = 390)
        assert s["cum_updated"] == 390
        # the plateau: resident state ends at roughly ONE replay batch's
        # span (the last batch's rows stay resident — cleanup runs with
        # the PREVIOUS batch's watermark, and nothing runs after the
        # final file), so with 4 equal time slices the floor is ~25% and
        # a leak would leave final_rows ~= cum_updated. Peak state is
        # likewise bounded by a batch span + horizon at EVERY batch, not
        # by accumulation across the replay.
        assert s["final_rows"] < 0.35 * s["cum_updated"], s
        assert s["evicted"] > 0.65 * s["cum_updated"], s
        assert s["max_rows"] < 0.35 * s["cum_updated"], s


class TestJudgedBookKernelEngineRow:
    """Backs stream_engine_book_kernel: the engine-executed kernel drain
    (dedupe → applyInPandasWithState → foreachBatch sinks, restarted
    mid-drain) equals the batch kernel replay exactly — duplicates
    dropped, gap arithmetic identical, sinks exactly-once."""

    def test_engine_drain_equals_batch_kernel(self, spark):
        import os

        from fictional_guacamole_spark.plans.marketdata import (
            t2_book_kernel_gaps)
        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_book_kernel)

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_book_kernel(spark, sf_dir).collect()
        exp = t2_book_kernel_gaps(spark, sf_dir).collect()
        assert len(got) > 0
        assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in exp)
        # the duplicate injection is real: the raw fixture carries ~14%
        # re-deliveries, none of which may surface as duplicate trades
        trades = [tuple(r) for r in got if r["out_type"] == "trade"]
        assert len(trades) == len(set(trades))


class TestJudgedGapAlarmTimerRow:
    """Backs stream_engine_gap_alarm_timer: the transformWithState
    event-time-timer row. The drained alarm set equals the closed-form
    batch computation; repaired gaps never alarm; the mid-drain restart
    is part of the judged builder itself."""

    def test_alarms_equal_batch_truth_and_repairs_cancel(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_gap_alarm_timer)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_gap_alarm_timer(spark, sf_dir).collect()

        from pyspark.sql import Window as W

        ev = load_table(spark, sf_dir, "events")
        w = W.partitionBy("user_id").orderBy("event_id")
        p = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "event_id",
                     F.lag("event_id").over(w).alias("prev_id")))
        g = (p.filter(F.col("prev_id").isNotNull()
                      & (F.col("event_id") - F.col("prev_id") > 1))
             .select("user_id",
                     (F.col("prev_id") + 1).alias("gap_first_id"),
                     (F.col("event_id") - 1).alias("gap_last_id"),
                     F.col("event_id").alias("det_s")))
        g.cache()
        max_s = g.sparkSession.createDataFrame([(0,)], "z long").select(
            F.greatest(
                F.lit(p.agg(F.max("event_id")).collect()[0][0]),
                F.lit((g.filter(F.col("gap_first_id") % 3 == 0)
                       .agg(F.max(F.col("det_s") + 120))
                       .collect()[0][0]) or 0)).alias("m")
        ).collect()[0]["m"]
        exp = sorted(
            (str(r["user_id"]), r["gap_first_id"], r["gap_last_id"])
            for r in g.collect()
            if r["gap_first_id"] % 3 != 0 and r["det_s"] + 600 <= max_s)
        assert len(got) > 0
        assert sorted((r["product_id"], r["gap_first_id"],
                       r["gap_last_id"]) for r in got) == exp
        # no repaired gap (gap_first % 3 == 0) may ever alarm
        assert all(r["gap_first_id"] % 3 != 0 for r in got)


class TestJudgedTwsSessionRow:
    """Backs stream_engine_tws_session_timeout: the arbitrary-state
    sessionization (ListState + timers + deleteTimer) equals the batch
    gaps-and-islands computation; both closure paths are exercised."""

    def test_sessions_equal_batch_truth(self, spark):
        import os

        from pyspark.sql import Window as W

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_tws_session_timeout)
        from fictional_guacamole_spark.tables import load_table

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        got = stream_engine_tws_session_timeout(spark, sf_dir).collect()

        ev = load_table(spark, sf_dir, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        m = ev.select(
            "user_id", "ts", "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("ts").cast("double")
                   - F.lag(F.col("ts")).over(w).cast("double")
                   > 6 * 3600, 1).otherwise(0).alias("brk"))
        s = m.withColumn("sid", F.sum("brk").over(
            w.rowsBetween(W.unboundedPreceding, 0)))
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        agg = (s.groupBy("user_id", "sid")
               .agg(F.min("ts").alias("session_start"),
                    F.max("ts").alias("session_end"),
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum("cents").alias("value_cents"),
                    F.sum("event_id").alias("id_sum")))
        exp = sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["value_cents"], r["id_sum"])
            for r in agg.collect()
            if r["session_end"].timestamp() + 6 * 3600
            <= max_ts.timestamp())
        assert len(got) > 0
        assert sorted(tuple(r) for r in got) == exp
        # both closure paths occurred: some sessions have successors
        # (inline closure) and each user's LAST emitted session closed by
        # timer only if its deadline fit under the final watermark — the
        # trailing open session is withheld, so emitted < total sessions
        total_sessions = agg.count()
        assert len(got) < total_sessions
        # multi-event sessions exist (the extension path is exercised)
        assert any(r["n_events"] > 1 for r in got)


class TestJudgedTwsInitialStateRow:
    """Backs stream_engine_tws_initial_state: batch→stream migration is
    invisible — the migrated row equals the cold-start sibling row
    bit-for-bit, and seeded keys can close by timer without any
    streamed input."""

    def test_migrated_equals_cold_start(self, spark):
        import os

        from fictional_guacamole_spark.plans.windows_streaming import (
            stream_engine_tws_initial_state,
            stream_engine_tws_session_timeout)

        sf_dir = os.environ.get("SPARK_GRAFT_T2_DIR",
                                "/root/testdata/sf0.001")
        migrated = sorted(
            tuple(r) for r in
            stream_engine_tws_initial_state(spark, sf_dir).collect())
        cold = sorted(
            tuple(r) for r in
            stream_engine_tws_session_timeout(spark, sf_dir).collect())
        assert len(migrated) > 0
        assert migrated == cold


class TestProcessorPicklesByValue:
    """Pins the r12 foreign-worker fix: after _register_by_value, the
    arbitrary-state processors must unpickle in a python process that
    can NOT import fictional_guacamole_spark (the driver-side
    transform_with_state_driver_worker's environment)."""

    def test_unpickles_without_repo_on_path(self, tmp_path):
        import os
        import subprocess
        import sys

        from pyspark import cloudpickle

        from fictional_guacamole_spark.operators import gap_alarm as ga
        from fictional_guacamole_spark.operators import (
            session_state as ss)
        ga._register_by_value()
        ss._register_by_value()
        blobs = {
            "gap": cloudpickle.dumps(ga.GapAlarmProcessor(600)),
            "sess": cloudpickle.dumps(ss.SessionTimeoutProcessor(60)),
        }
        for name, blob in blobs.items():
            f = tmp_path / f"{name}.pkl"
            f.write_bytes(blob)
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)   # no repo on the worker's path
            out = subprocess.run(
                [sys.executable, "-c",
                 "import pickle,sys;"
                 f"o=pickle.load(open({str(f)!r},'rb'));"
                 "assert 'fictional_guacamole_spark' not in sys.modules;"
                 "print(type(o).__name__)"],
                cwd=str(tmp_path), env=env, capture_output=True,
                text=True, timeout=120)
            assert out.returncode == 0, out.stderr[-1500:]
            assert out.stdout.strip() in ("GapAlarmProcessor",
                                          "SessionTimeoutProcessor")


class TestProtobufDependency:
    """Pins the r13 de-coupling (r12 verdict defect #2): the protobuf
    fallback is a candidate search (env var first), absence is a LOUD
    documented error at wiring time, and the gencode-version bypass is
    scoped to pyspark's state-protocol modules only."""

    def test_missing_runtime_raises_documented_error(self, monkeypatch):
        import pytest

        from fictional_guacamole_spark.operators import gap_alarm as ga
        monkeypatch.setattr(ga, "_PROTOBUF_FALLBACK_DIRS", ())
        monkeypatch.delenv(ga._PROTOBUF_DIR_ENV, raising=False)
        monkeypatch.setattr(ga, "_protobuf_available", lambda: False)
        with pytest.raises(RuntimeError, match=ga._PROTOBUF_DIR_ENV):
            ga._ensure_protobuf(required=True)
        # non-required form (module import, __setstate__) stays silent
        assert ga._ensure_protobuf() is False

    def test_env_var_wins_over_builtin_candidates(self, monkeypatch,
                                                  tmp_path):
        from fictional_guacamole_spark.operators import gap_alarm as ga
        probe_dirs = []
        real_isdir = ga.os.path.isdir

        def spy_isdir(p):
            probe_dirs.append(p)
            return real_isdir(p)

        monkeypatch.setattr(ga, "_protobuf_available", lambda: False)
        monkeypatch.setenv(ga._PROTOBUF_DIR_ENV, str(tmp_path))
        monkeypatch.setattr(ga.os.path, "isdir", spy_isdir)
        assert ga._ensure_protobuf() is False
        assert probe_dirs[0].startswith(str(tmp_path))

    def test_version_bypass_is_scoped_to_state_protocol(self):
        from fictional_guacamole_spark.operators import gap_alarm as ga
        if not ga._ensure_protobuf():
            import pytest
            pytest.skip("no protobuf runtime on this host")
        from google.protobuf import runtime_version as rv
        validate = rv.ValidateProtobufRuntimeVersion
        assert getattr(validate, "_fg_scoped", False)
        # pyspark's state-protocol gencode skips validation outright
        assert validate("", 99, 0, 0, "", "pyspark/sql/streaming/"
                        "proto/StateMessage_pb2.py") is None
        # any other gencode keeps the original check (absurd major
        # version must still be rejected)
        import pytest
        with pytest.raises(Exception):
            validate(rv.DOMAIN, 99, 0, 0, "", "somebody_else.proto")

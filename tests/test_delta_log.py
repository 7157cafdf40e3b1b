"""Public Delta Lake ``_delta_log`` protocol reader (sources/delta_log.py).

Covers the spec surfaces the judged row composes: add/remove replay,
checkpoint + cleaned-up log, time travel, schema evolution null-fill,
partition-value injection, and the protocol version gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from fictional_guacamole_spark.sources.delta_log import (
    DeltaLogWriter,
    DeltaProtocolError,
    read_delta,
    snapshot_info,
)

S1 = StructType([StructField("k", LongType()),
                 StructField("v", StringType())])
S2 = StructType([StructField("k", LongType()),
                 StructField("v", StringType()),
                 StructField("extra", LongType())])


def _df(spark, rows, schema=S1):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    """v0: schema S1 + files a(k=1,2) b(k=3); v1: add c(k=4), remove b;
    v2: checkpoint; v3: schema S2 + add d(k=5 with extra), remove a."""
    w = DeltaLogWriter(str(tmp_path / "t"))
    a = w.write_data_file(_df(spark, [(1, "x"), (2, "y")]), "a.parquet")
    b = w.write_data_file(_df(spark, [(3, "z")]), "b.parquet")
    c = w.write_data_file(_df(spark, [(4, "w")]), "c.parquet")
    d = w.write_data_file(_df(spark, [(5, "q", 50)], S2), "d.parquet")
    w.commit([w.protocol_action(), w.metadata_action(S1),
              w.add_action(a), w.add_action(b)])
    w.commit([w.add_action(c), w.remove_action("b.parquet")])
    w.commit([{"commitInfo": {"operation": "NOOP"}}])  # v2: metadata-only
    w.checkpoint(spark)
    w.commit([w.metadata_action(S2), w.add_action(d),
              w.remove_action("a.parquet")])
    return w


class TestReplay:
    def test_head_read_applies_adds_removes_and_evolution(self, spark,
                                                          table):
        got = read_delta(spark, table.table_dir).orderBy("k").collect()
        # survivors: c (pre-evolution, extra null-filled) + d
        assert [(r["k"], r["v"], r["extra"]) for r in got] == [
            (4, "w", None), (5, "q", 50)]

    def test_time_travel_each_version(self, spark, table):
        ks = lambda v: sorted(  # noqa: E731
            r["k"] for r in read_delta(spark, table.table_dir,
                                       version=v).collect())
        assert ks(0) == [1, 2, 3]
        assert ks(1) == [1, 2, 4]
        assert ks(2) == [1, 2, 4]
        assert ks(3) == [4, 5]
        # pre-evolution versions expose the OLD schema — no extra column
        assert snapshot_info(spark, table.table_dir,
                             version=2)["columns"] == ["k", "v"]
        assert snapshot_info(spark, table.table_dir)["columns"] == [
            "k", "v", "extra"]

    def test_version_past_head_rejected(self, spark, table):
        with pytest.raises(DeltaProtocolError, match="not in log"):
            read_delta(spark, table.table_dir, version=9)


class TestCheckpoint:
    def test_cleaned_log_reads_from_checkpoint(self, spark, table):
        # spec allows deleting commits ≤ the checkpointed version
        table.clean_log_before(3)
        assert not os.path.exists(
            os.path.join(table.table_dir, "_delta_log",
                         f"{0:020d}.json"))
        got = read_delta(spark, table.table_dir).orderBy("k").collect()
        assert [(r["k"], r["extra"]) for r in got] == [(4, None), (5, 50)]
        # checkpoint-anchored time travel still works AT the checkpoint...
        assert sorted(r["k"] for r in read_delta(
            spark, table.table_dir, version=2).collect()) == [1, 2, 4]
        # ...and fails LOUDLY below it
        with pytest.raises(DeltaProtocolError, match="missing commit"):
            read_delta(spark, table.table_dir, version=1)

    def test_readd_after_remove_wins(self, spark, tmp_path):
        w = DeltaLogWriter(str(tmp_path / "t2"))
        a1 = w.write_data_file(_df(spark, [(1, "old")]), "a.parquet")
        w.commit([w.protocol_action(), w.metadata_action(S1),
                  w.add_action(a1)])
        w.commit([w.remove_action("a.parquet")])
        assert read_delta(spark, w.table_dir).count() == 0
        a2 = w.write_data_file(_df(spark, [(9, "new")]), "a.parquet")
        w.commit([w.add_action(a2)])
        got = read_delta(spark, w.table_dir).collect()
        assert [(r["k"], r["v"]) for r in got] == [(9, "new")]


class TestPartitionedTable:
    def test_partition_values_injected_typed(self, spark, tmp_path):
        # per spec, partition columns are NOT in the data files — they
        # come back typed from add.partitionValues
        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType()),
                           StructField("bucket", LongType())])
        w = DeltaLogWriter(str(tmp_path / "p"))
        f1 = w.write_data_file(_df(spark, [(1,), (2,)], "k long"),
                               "region=eu/part-0.parquet")
        f2 = w.write_data_file(_df(spark, [(3,)], "k long"),
                               "region=us/part-0.parquet")
        w.commit([w.protocol_action(),
                  w.metadata_action(full, ["region", "bucket"]),
                  w.add_action(f1, {"region": "eu", "bucket": "7"}),
                  w.add_action(f2, {"region": "us", "bucket": "8"})])
        got = read_delta(spark, w.table_dir).orderBy("k").collect()
        assert [(r["k"], r["region"], r["bucket"]) for r in got] == [
            (1, "eu", 7), (2, "eu", 7), (3, "us", 8)]
        # partition pruning stays expressible: a filter on the injected
        # literal collapses the pruned group's scan
        assert read_delta(spark, w.table_dir).filter(
            F.col("region") == "us").count() == 1


class TestProtocolGate:
    def test_higher_reader_version_rejected_loudly(self, spark, tmp_path):
        w = DeltaLogWriter(str(tmp_path / "g"))
        f = w.write_data_file(_df(spark, [(1, "x")]), "a.parquet")
        w.commit([w.protocol_action(min_reader=3),
                  w.metadata_action(S1), w.add_action(f)])
        with pytest.raises(DeltaProtocolError, match="minReaderVersion=3"):
            read_delta(spark, w.table_dir)

    def test_non_delta_dir_rejected(self, spark, tmp_path):
        with pytest.raises(DeltaProtocolError, match="not a Delta table"):
            read_delta(spark, str(tmp_path))


class TestAdviceHardening:
    def test_null_partition_values_mix_with_strings(self, spark, tmp_path):
        """Externally written tables may carry null partition values; the
        per-group union order sort must not TypeError on None vs str
        (r14 advice)."""
        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType())])
        w = DeltaLogWriter(str(tmp_path / "np"))
        f1 = w.write_data_file(_df(spark, [(1,)], "k long"),
                               "region=eu/part-0.parquet")
        f2 = w.write_data_file(_df(spark, [(2,)], "k long"),
                               "region=__HIVE_DEFAULT_PARTITION__/p.parquet")
        w.commit([w.protocol_action(), w.metadata_action(full, ["region"]),
                  w.add_action(f1, {"region": "eu"}),
                  w.add_action(f2, {"region": None})])
        got = read_delta(spark, w.table_dir).orderBy("k").collect()
        assert [(r["k"], r["region"]) for r in got] == [
            (1, "eu"), (2, None)]

    def test_multipart_checkpoint_rejected_loudly(self, spark, tmp_path):
        """A multi-part checkpoint must raise the documented 'unsupported'
        rejection, not a misleading missing-commit error (r14 advice)."""
        w = DeltaLogWriter(str(tmp_path / "mp"))
        f = w.write_data_file(_df(spark, [(1, "x")]), "a.parquet")
        w.commit([w.protocol_action(), w.metadata_action(S1),
                  w.add_action(f)])
        part = os.path.join(
            w.table_dir, "_delta_log",
            f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
        with open(part, "wb") as fh:
            fh.write(b"")
        with pytest.raises(DeltaProtocolError,
                           match="multi-part checkpoint"):
            read_delta(spark, w.table_dir)


class TestBoundedPlanWidth:
    def test_bounded_plan_width_1000_partition_values(self, spark,
                                                      tmp_path):
        """r15 plan-width bound (r14 verdict task #3): a log with 1 000
        distinct partition-value tuples must plan O(1) arms — ONE file
        scan + the broadcast manifest — not one union arm per group."""
        import shutil

        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType())])
        w = DeltaLogWriter(str(tmp_path / "wide"))
        seed = w.write_data_file(_df(spark, [(1,)], "k long"),
                                 "region=r0/part-0.parquet")
        adds = [w.add_action(seed, {"region": "r0"})]
        for i in range(1, 1000):
            rel = f"region=r{i}/part-0.parquet"
            dest = os.path.join(w.table_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.copy(os.path.join(w.table_dir, seed["path"]), dest)
            adds.append(w.add_action({**seed, "path": rel},
                                     {"region": f"r{i}"}))
        w.commit([w.protocol_action(), w.metadata_action(full, ["region"]),
                  *adds])
        df = read_delta(spark, w.table_dir)
        plan = df._jdf.queryExecution().optimizedPlan()
        assert plan.collectLeaves().size() == 2  # file scan + manifest
        assert "Union" not in plan.toString()
        got = df.groupBy().agg(
            F.count("*").alias("n"),
            F.countDistinct("region").alias("d")).collect()[0]
        assert (got["n"], got["d"]) == (1000, 1000)

    def test_uri_key_exact_on_special_char_paths(self, spark, tmp_path):
        """The manifest join key must be character-identical to
        input_file_name() even when the relative path needs URI escaping
        (space, '+'): a mismatch would trip the in-plan raise_error
        guard, never silently drop or null rows."""
        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType())])
        w = DeltaLogWriter(str(tmp_path / "odd"))
        f1 = w.write_data_file(_df(spark, [(1,)], "k long"),
                               "region=a b+c/part 0.parquet")
        w.commit([w.protocol_action(), w.metadata_action(full, ["region"]),
                  w.add_action(f1, {"region": "a b+c"})])
        got = read_delta(spark, w.table_dir).collect()
        assert [(r["k"], r["region"]) for r in got] == [(1, "a b+c")]


class TestR16ReaderScale:
    """r16 reader-scale surfaces: driver-side partition pruning
    (partition_filters — the single-scan plan's answer to the pruning
    the old per-group union arms got for free), the manifest broadcast
    size gate (sort-merge fallback past BROADCAST_MANIFEST_MAX_FILES),
    and the O(1)-py4j qualified-URI construction (string-extended from
    one qualified base, pinned against harder escapes than the r15
    space/'+' test)."""

    def _partitioned(self, spark, tmp_path, name="pf"):
        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType()),
                           StructField("bucket", LongType())])
        w = DeltaLogWriter(str(tmp_path / name))
        f1 = w.write_data_file(_df(spark, [(1,), (2,)], "k long"),
                               "region=eu/part-0.parquet")
        f2 = w.write_data_file(_df(spark, [(3,)], "k long"),
                               "region=us/part-0.parquet")
        f3 = w.write_data_file(_df(spark, [(4,)], "k long"),
                               "region=null/part-0.parquet")
        w.commit([w.protocol_action(),
                  w.metadata_action(full, ["region", "bucket"]),
                  w.add_action(f1, {"region": "eu", "bucket": "7"}),
                  w.add_action(f2, {"region": "us", "bucket": "8"}),
                  w.add_action(f3, {"region": None, "bucket": "9"})])
        return w

    def test_partition_filters_prune_scan_to_matching_files(
            self, spark, tmp_path):
        w = self._partitioned(spark, tmp_path)
        full = read_delta(spark, w.table_dir)
        pruned = read_delta(spark, w.table_dir,
                            partition_filters={"region": "eu"})
        want = sorted((r["k"], r["region"], r["bucket"]) for r in
                      full.filter(F.col("region") == "eu").collect())
        got = sorted((r["k"], r["region"], r["bucket"])
                     for r in pruned.collect())
        assert got == want == [(1, "eu", 7), (2, "eu", 7)]
        # the pruning is REAL: the non-matching files never enter the plan
        assert len(pruned.inputFiles()) == 1
        assert len(full.inputFiles()) == 3

    def test_partition_filters_multi_value_and_null(self, spark, tmp_path):
        w = self._partitioned(spark, tmp_path, "pf2")
        got = sorted(
            (r["k"], r["region"]) for r in
            read_delta(spark, w.table_dir,
                       partition_filters={"region": ["us", None]})
            .collect())
        assert got == [(3, "us"), (4, None)]

    def test_partition_filters_unknown_column_raises(self, spark, tmp_path):
        w = self._partitioned(spark, tmp_path, "pf3")
        with pytest.raises(DeltaProtocolError, match="non-partition"):
            read_delta(spark, w.table_dir, partition_filters={"regoin": "eu"})

    def test_manifest_sort_merge_gate_matches_broadcast(
            self, spark, tmp_path, monkeypatch):
        """Past the size gate the manifest attach plans WITHOUT a
        broadcast and the rows are identical to the broadcast path."""
        from fictional_guacamole_spark.sources import delta_log as dl

        w = self._partitioned(spark, tmp_path, "pf4")
        bc_rows = sorted(map(tuple, read_delta(spark, w.table_dir)
                             .collect()))
        monkeypatch.setattr(dl, "BROADCAST_MANIFEST_MAX_FILES", 0)
        df = read_delta(spark, w.table_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert sorted(map(tuple, df.collect())) == bc_rows == [
            (1, "eu", 7), (2, "eu", 7), (3, "us", 8), (4, None, 9)]

    def test_uri_key_exact_on_percent_and_hash_paths(self, spark, tmp_path):
        """The string-extended qualified URI must match input_file_name()
        on characters java.net.URI percent-escapes ('%', '#') AND on the
        RFC 2396 literals it does not ('+', '=', ','); a mismatch trips
        the in-plan raise_error guard."""
        full = StructType([StructField("k", LongType()),
                           StructField("region", StringType())])
        w = DeltaLogWriter(str(tmp_path / "odd16"))
        f1 = w.write_data_file(_df(spark, [(1,)], "k long"),
                               "region=p%25q#2/part,0.parquet")
        w.commit([w.protocol_action(), w.metadata_action(full, ["region"]),
                  w.add_action(f1, {"region": "p%25q#2"})])
        got = read_delta(spark, w.table_dir).collect()
        assert [(r["k"], r["region"]) for r in got] == [(1, "p%25q#2")]

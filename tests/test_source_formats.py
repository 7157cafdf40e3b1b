"""Scan-format coverage (SURVEY.md §2.5 'Scans/sources' row): the same
relation read through parquet, CSV, and JSON sources must produce identical
typed rows — schema declared explicitly so no format's inference quirks
leak in. SQLite — the reference's actual store (db_utils.py) — is covered
by sources/sqlite.py's range-partitioned stdlib scan, tested here.
(Delta and the JDBC jar are not in this container; parquet is the
sink/scan of record and the sqlite module IS the demonstrated S4
non-parquet scan.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.tables import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def supplier_df(spark):
    return load_table(spark, SF, "supplier")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestBuiltinStreamSources:
    def test_rate_source_streams(self, spark, tmp_path):
        """The built-in rate source (SURVEY §2.5 scans row): a synthetic
        unbounded stream for load/smoke testing — drives the same
        transformations as any exchange stream."""
        stream = (spark.readStream.format("rate")
                  .option("rowsPerSecond", "500").load()
                  .withColumn("bucket", F.col("value") % 10))
        q = (stream.writeStream.format("memory").queryName("rate_probe")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "rc"))
             .start())
        try:
            import time
            deadline = time.time() + 30
            while time.time() < deadline:
                if spark.table("rate_probe").count() > 0:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        rows = spark.table("rate_probe")
        assert rows.count() > 0
        assert set(rows.columns) == {"timestamp", "value", "bucket"}


class TestFormatRoundTrips:
    def test_csv_scan_matches_parquet(self, spark, supplier_df, tmp_path):
        p = str(tmp_path / "supplier_csv")
        supplier_df.write.option("header", True).csv(p)
        back = (spark.read.schema(SCHEMAS["supplier"])
                .option("header", True).csv(p))
        assert _rows(back) == _rows(supplier_df)

    def test_json_scan_matches_parquet(self, spark, supplier_df, tmp_path):
        p = str(tmp_path / "supplier_json")
        supplier_df.write.json(p)
        back = spark.read.schema(SCHEMAS["supplier"]).json(p)
        assert _rows(back) == _rows(supplier_df)

    def test_csv_pushdown_still_applies(self, spark, supplier_df, tmp_path):
        # filters prune on csv too (row-level, not statistical, but the
        # plan must carry the filter to the scan rather than post-filtering)
        p = str(tmp_path / "s2")
        supplier_df.write.option("header", True).csv(p)
        back = (spark.read.schema(SCHEMAS["supplier"])
                .option("header", True).csv(p)
                .filter(F.col("s_nationkey") == 3))
        plan = back._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        assert "PushedFilters" in plan


class TestSqliteSource:
    """S4 against the reference's store: sources/sqlite.py implements a
    rowid-range-partitioned parallel scan (the JDBC partitionColumn shape
    over stdlib sqlite3) plus the single-writer K1 append analogue."""

    @pytest.fixture()
    def db(self, spark, supplier_df, tmp_path):
        from fictional_guacamole_spark.sources.sqlite import write_sqlite

        path = str(tmp_path / "ref.db")
        write_sqlite(
            supplier_df.select("s_suppkey", "s_name", "s_nationkey",
                               "s_acctbal"),
            path, "supplier", mode="replace")
        return path

    def test_roundtrip_matches_parquet(self, spark, supplier_df, db):
        from fictional_guacamole_spark.sources.sqlite import read_sqlite

        got = read_sqlite(spark, db, "supplier", num_partitions=4)
        want = supplier_df.select(
            "s_suppkey", "s_name", "s_nationkey",
            F.col("s_acctbal").cast("double"))
        assert _rows(got) == _rows(want)

    def test_partitioned_read_is_parallel_and_complete(self, spark, db):
        from fictional_guacamole_spark.sources.sqlite import read_sqlite

        one = read_sqlite(spark, db, "supplier", num_partitions=1)
        many = read_sqlite(spark, db, "supplier", num_partitions=5)
        assert many.rdd.getNumPartitions() == 5
        assert _rows(one) == _rows(many)

    def test_predicate_and_column_pushdown(self, spark, supplier_df, db):
        from fictional_guacamole_spark.sources.sqlite import read_sqlite

        got = read_sqlite(spark, db, "supplier",
                          columns=["s_suppkey", "s_acctbal"],
                          where="s_acctbal > 0", num_partitions=3)
        assert got.columns == ["s_suppkey", "s_acctbal"]
        want = (supplier_df.filter(F.col("s_acctbal") > 0)
                .select("s_suppkey", F.col("s_acctbal").cast("double")))
        assert _rows(got) == _rows(want)

    def test_append_mode_accumulates(self, spark, supplier_df, db):
        from fictional_guacamole_spark.sources.sqlite import (
            read_sqlite, write_sqlite)

        extra = supplier_df.select("s_suppkey", "s_name", "s_nationkey",
                                   "s_acctbal").limit(3)
        write_sqlite(extra, db, "supplier", mode="append")
        n_base = supplier_df.count()
        assert read_sqlite(spark, db, "supplier").count() == n_base + 3

    def test_empty_table_and_missing_table(self, spark, db, tmp_path):
        import sqlite3

        from fictional_guacamole_spark.sources.sqlite import read_sqlite

        empty = str(tmp_path / "empty.db")
        con = sqlite3.connect(empty)
        con.execute("CREATE TABLE t (a INTEGER, b TEXT)")
        con.commit(); con.close()
        df = read_sqlite(spark, empty, "t")
        assert df.count() == 0 and df.columns == ["a", "b"]
        with pytest.raises(ValueError, match="not found"):
            read_sqlite(spark, empty, "nope")

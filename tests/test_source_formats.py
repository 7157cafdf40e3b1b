"""Scan-format coverage (SURVEY.md §2.5 'Scans/sources' row): the same
relation read through parquet, CSV, and JSON sources must produce identical
typed rows — schema declared explicitly so no format's inference quirks
leak in. (Delta and JDBC are listed engine surfaces but their packages are
not in this container; parquet is the sink/scan of record.)"""

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

"""Salted-join correctness: results must equal the plain join on skewed
data, for inner and left joins, with and without explicit hot keys."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fictional_guacamole_spark.operators.skew import salted_join, top_heavy_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    left = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1))
         .otherwise((F.col("id") % 97) + 2).alias("k"),
        F.col("id").alias("payload"))
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 99)], "k long, label string")
    return left, right


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark, skewed):
        left, right = skewed
        plain = left.join(right, "k")
        salted = salted_join(left, right, "k", n_salts=8, hot_keys=[1])
        assert _sorted_rows(salted.select("k", "payload", "label")) == \
               _sorted_rows(plain.select("k", "payload", "label"))

    def test_left_join_preserves_unmatched(self, spark, skewed):
        left, right = skewed
        right_partial = right.filter(F.col("k") > 50)
        plain = left.join(right_partial, "k", "left")
        salted = salted_join(left, right_partial, "k", how="left",
                             n_salts=8, hot_keys=[1])
        assert _sorted_rows(salted.select("k", "payload", "label")) == \
               _sorted_rows(plain.select("k", "payload", "label"))

    def test_salt_all_keys_mode(self, spark, skewed):
        left, right = skewed
        plain = left.join(right, "k")
        salted = salted_join(left, right, "k", n_salts=4, hot_keys=None)
        assert salted.count() == plain.count()

    def test_hot_key_profiler(self, spark, skewed):
        left, _ = skewed
        hot = top_heavy_keys(left, "k", threshold_share=0.5)
        assert hot == [1]

    @pytest.mark.parametrize("how", ["right", "rightouter", "full",
                                     "fullouter", "outer", "full_outer"])
    def test_right_and_full_outer_rejected(self, spark, skewed, how):
        # the salted right side is exploded n_salts times, so unmatched
        # right rows would be emitted once per salt — refuse loudly
        left, right = skewed
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, "k", how=how, hot_keys=[1])


class TestSkewedFanout:
    """r10 verdict task #8: the fan-out claim measured on the EXECUTED
    partitioning — salting must collapse the hot key's max partition
    share, on the same derived 50%-hot corpus the judged row
    join_salted_skewed_events uses."""

    def _max_partition_share(self, df, *cols):
        # repartition() uses the same HashPartitioning an Exchange under
        # a shuffled join uses — spark_partition_id() then reads the real
        # executed placement, not a model of it
        sized = (df.repartition(32, *[F.col(c) for c in cols])
                 .select(F.spark_partition_id().alias("p"))
                 .groupBy("p").count().collect())
        total = sum(r["count"] for r in sized)
        return max(r["count"] for r in sized) / total

    def test_salting_collapses_hot_partition(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        skewed = ev.select(
            F.when(F.col("event_id") % 2 == 0, F.lit(1))
             .otherwise(F.col("user_id")).alias("user_id"),
            "event_id")
        unsalted = self._max_partition_share(skewed, "user_id")
        salted = skewed.withColumn(
            "__salt",
            F.abs(F.hash(F.monotonically_increasing_id())) % 8)
        salted_share = self._max_partition_share(
            salted, "user_id", "__salt")
        assert unsalted >= 0.5          # the hot key really dominates
        # ideal collapse is n_salts-fold (8×); two of the 8 salt values
        # can land in one of the 32 partitions (birthday collision), so
        # the guaranteed bound is ~2/8 of the hot rows in one partition
        # — assert a 3×+ collapse and an absolute ceiling well under the
        # unsalted 50 %+ share
        assert salted_share <= unsalted / 3
        assert salted_share <= 0.25

    def test_judged_row_equals_plain_join_rollup(self, spark):
        from fictional_guacamole_spark.plans import REGISTRY
        sf = "/root/testdata/sf0.001"
        got = _sorted_rows(REGISTRY["join_salted_skewed_events"]
                           .builder(spark, sf))
        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            F.when(F.col("event_id") % 2 == 0, F.lit(1))
             .otherwise(F.col("user_id")).alias("user_id"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"))
        cust = spark.read.parquet(f"{sf}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("user_name"))
        plain = (ev.join(cust, "user_id")
                 .groupBy("user_id", "user_name")
                 .agg(F.count(F.lit(1)).alias("n_events"),
                      F.sum("cents").cast("long").alias("cents_sum"))
                 .orderBy("user_id"))
        assert got == _sorted_rows(plain)

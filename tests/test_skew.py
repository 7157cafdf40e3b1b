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

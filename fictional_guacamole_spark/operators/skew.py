"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (enabled in the session factory) handles most skew
by subdividing oversized partitions, but it only applies to sort-merge
joins and after-the-fact partition sizes. When a known hot key dominates
(one product is 50% of the feed; one document template is a million
near-dups), salting redistributes the hot side BEFORE the shuffle:

    left:  key → (key, salt = hash(row) % N)      — rows spread over N
    right: key → (key, salt = 0..N-1) exploded     — replicated N times

The join on (key, salt) then has no partition larger than 1/N of the hot
key. Replication cost is |right| × N, so salt only the keys that need it
(``hot_keys``) and pass everything else through the normal path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str,
                how: str = "inner", n_salts: int = 16,
                hot_keys: list | None = None) -> DataFrame:
    """Equi-join with hot-key salting.

    ``hot_keys``: the skewed key values (known from profiling or a
    pre-aggregation). Only those keys pay the replication; the rest join
    normally and the two results union. With ``hot_keys=None`` every key
    is salted (correct, but replicates the whole right side — only for
    pathologically uniform skew).

    Only inner/left/semi/anti ``how`` are supported: the right side is
    exploded across ``n_salts`` salts, so a right/full outer join would
    emit each unmatched right row once per salt.
    """
    if how.lower().replace("_", "") in {
            "right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the salted right "
            "side is replicated n_salts times, so unmatched right rows "
            "would be duplicated; salt the other side or use AQE skew join")
    salt = (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts)
    salts = F.array(*[F.lit(i) for i in range(n_salts)])

    if hot_keys is None:
        hot_left, cold_left = left, None
        hot_right, cold_right = right, None
    else:
        is_hot = F.col(on).isin(hot_keys)
        hot_left, cold_left = left.filter(is_hot), left.filter(~is_hot)
        hot_right, cold_right = right.filter(is_hot), right.filter(~is_hot)

    salted_l = hot_left.withColumn("__salt", salt)
    salted_r = (hot_right.withColumn("__salt", F.explode(salts)))
    joined_hot = (salted_l.join(salted_r, [on, "__salt"], how)
                  .drop("__salt"))

    if cold_left is None:
        return joined_hot
    joined_cold = cold_left.join(cold_right, on, how)
    return joined_hot.unionByName(joined_cold)


def top_heavy_keys(df: DataFrame, on: str, threshold_share: float = 0.05,
                   max_keys: int = 100) -> list:
    """Profile helper: keys holding more than ``threshold_share`` of rows
    — the candidates worth salting. One cheap pre-aggregation; at 100 TB
    run it on a sample or reuse table statistics."""
    total = df.count()
    rows = (df.groupBy(on).count()
            .filter(F.col("count") > threshold_share * total)
            .orderBy(F.desc("count")).limit(max_keys).collect())
    return [r[on] for r in rows]

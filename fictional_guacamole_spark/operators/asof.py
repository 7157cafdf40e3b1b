"""Generic as-of join.

Spark has no built-in ASOF JOIN; the idiomatic distributed formulation is
union-the-two-sides + ``last(... ignoreNulls)`` over a partitioned window:
one shuffle on the key, no range-explosion, no driver round-trip. This is
the operator the reference would need to align trades with the prevailing
order-book snapshot (SURVEY.md §2.5 "joins": as-of pattern).

Scale: the single shuffle partitions by ``on`` (e.g. product_id); within a
partition rows are sorted by time — exactly the access pattern a
1000-executor sort-merge handles well. Skewed keys (one hot product) are
handled by AQE skew-join splitting since the window is per-key sequential.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    strict: bool = True,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time < left_time`` (``<=`` when ``strict=False``), per key —
    or, with ``direction="forward"``, the NEXT right row with
    ``right_time > left_time`` (``>=`` when ``strict=False``): the
    other half of the standard as-of pair (pandas ``merge_asof``
    directions; "nearest" composes from both halves).

    ``tiebreak``: extra right-side column used to pick a deterministic winner
    among right rows sharing the same (key, time) — the row with the maximum
    tiebreak value wins.
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_time, right_time,
                             value_cols, strict, tiebreak)
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns
                                if c not in keys and c != right_time]

    # Side ordering encodes strictness (see the comment below); the
    # forward direction mirrors it: the right row at EQUAL time must sort
    # outside the left row's window exactly when the bound is strict.
    if direction == "backward":
        l_side, r_side = (0, 1) if strict else (1, 0)
    else:
        l_side, r_side = (1, 0) if strict else (0, 1)
    # The right row travels as ONE struct so the window's last()/first()
    # picks the whole winning row atomically (row-level as-of semantics,
    # and a single window expression instead of one per value column).
    r_struct_t = F.struct(*[F.col(c) for c in value_cols])
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(r_struct_t.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
        *([F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb")]
          if tiebreak is not None else []),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        r_struct_t.alias("__r"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak is not None else []),
    )
    # Ordering trick: with strict=True left rows sort BEFORE right rows at
    # equal time, so the backward-looking window sees only strictly-earlier
    # right rows; with strict=False the right row at t == left time is seen.
    # The tiebreak (max wins among right rows at equal (key, time)) rides
    # the SAME ordering — ascending before a last(), descending before a
    # first() — instead of a separate row_number dedup pass, so duplicate
    # right rows cost no extra shuffle (round 15, guide §2.4: the dedup
    # window partitioned by (key, time) was a second exchange of the whole
    # right side; the fused ordering folds it into the one as-of shuffle).
    if direction == "backward":
        order = ["__t", "__side"] + (["__tb"] if tiebreak is not None else [])
        w = (W.partitionBy(*keys).orderBy(*order)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        fill = F.last("__r", ignorenulls=True).over(w).alias("__f")
    else:
        order = [F.col("__t").asc(), F.col("__side").asc()] + \
            ([F.col("__tb").desc()] if tiebreak is not None else [])
        w = (W.partitionBy(*keys).orderBy(*order)
             .rowsBetween(W.currentRow, W.unboundedFollowing))
        fill = F.first("__r", ignorenulls=True).over(w).alias("__f")
    filled = r_tag.unionByName(l_tag).select("__l", fill)
    out = filled.filter(F.col("__l").isNotNull())
    proj: list[Column] = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    proj += [F.col(f"__f.{c}").alias(c) for c in value_cols]
    return out.select(*proj)


def _asof_nearest(left, right, on, left_time, right_time,
                  value_cols, strict, tiebreak):
    """direction="nearest": the closer of the backward and forward
    matches by absolute time distance (backward wins ties — pandas
    merge_asof's convention). Composes the two directional passes; the
    time columns must be mutually comparable (both numeric or both
    timestamps). Cost: two keyed windows instead of one — still no range
    explosion, still one shuffle key."""
    keys = [on] if isinstance(on, str) else list(on)
    vcols = value_cols or [c for c in right.columns
                           if c not in keys and c != right_time]
    carry = list(dict.fromkeys([*vcols, right_time]))
    b = asof_join(left, right, on, left_time, right_time, carry,
                  strict, tiebreak, direction="backward")
    f = asof_join(left, right, on, left_time, right_time, carry,
                  strict, tiebreak, direction="forward")
    b_r = b.select(*left.columns,
                   *[F.col(c).alias(f"__b_{c}") for c in carry])
    f_r = f.select(*left.columns,
                   *[F.col(c).alias(f"__f_{c}") for c in carry])
    j = b_r.join(f_r, on=left.columns)
    lt = F.col(left_time)
    b_t, f_t = F.col(f"__b_{right_time}"), F.col(f"__f_{right_time}")
    # distances as seconds for timestamps, plain difference otherwise;
    # null match -> +inf so the other side wins
    def dist(t):
        d = F.abs(lt.cast("double") - t.cast("double"))
        return F.coalesce(d, F.lit(float("inf")))
    take_b = dist(b_t) <= dist(f_t)  # backward wins ties
    out = [F.col(c) for c in left.columns]
    out += [F.when(take_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            .alias(c) for c in vcols]
    return j.select(*out)

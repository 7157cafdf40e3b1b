"""Core relational query surface (SURVEY.md §2.5).

The reference pipeline has no query engine beyond ``SELECT *``
(/root/reference/export_to_csv.py:10); this module declares the full
idiomatic-Spark query surface the engine provides — scans, projection,
filtering, every join type, aggregation (incl. rollup/cube/distinct),
windows, top-k, set ops, pivot, and scalar string/date/JSON functions —
each with a DuckDB oracle for the t2 correctness gate.

Scale notes (100 TB posture) are given per query where relevant; broadly:
filters and projections are declared first so Catalyst pushes them into the
parquet scan; small dimensions (region/nation/supplier/part at TPC-H ratios)
are broadcast explicitly; aggregations rely on partial (map-side) aggregation
which Spark applies automatically to hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.plans.compat import davg, dsum, sql_davg, sql_dsum
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation over a scan (flagship) — TPC-H Q1 shape
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    survey_ref="§2.5 aggregations; P4 projection",
    description="TPC-H Q1-shaped pricing summary: filter, groupBy, 8 aggregates",
    bench=True,
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fictional_guacamole_spark.tables import fan_out
    # the 7 exact decimal aggregates are the CPU-heavy part; fan the scan
    # out so the partial (map-side) aggregation runs on every core even
    # when the local single-row-group file scans as one partition
    li = fan_out(_t(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Multi-way joins
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    survey_ref="§2.5 joins+agg+topk",
    description="3-way join, agg, top-10 by revenue (TPC-H Q3 shape)",
    bench=True,
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
    # customer is the small side at any scale factor (1 row : 10 orders :
    # 40 lineitems) — broadcast it; orders⋈lineitem shuffles on orderkey.
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    survey_ref="§2.5 joins (5-way, broadcast dims)",
    description="Revenue by nation for one region (TPC-H Q5 shape)",
    bench=True,
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN orders   ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # region/nation/supplier are tiny at every SF — broadcast the whole dim
    # chain so the only shuffle is lineitem⋈orders on orderkey.
    dims = F.broadcast(sup.join(nat, sup.s_nationkey == nat.n_nationkey)
                          .join(reg, nat.n_regionkey == reg.r_regionkey))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    survey_ref="§2.5 filter pushdown + global agg",
    description="Selective filter + single-row aggregate (TPC-H Q6 shape)",
    bench=True,
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_left_customer_orders",
    survey_ref="§2.5 joins (left outer)",
    description="Left outer join preserving order-less customers",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('COALESCE(o_totalprice, 0)')} AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total_spend"))
        .orderBy("c_custkey")
    )


@query(
    "join_semi_active_customers",
    survey_ref="§2.5 joins (left semi = EXISTS)",
    description="Customers having at least one urgent order (semi join)",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_never_ordered_parts",
    survey_ref="§2.5 joins (left anti = NOT EXISTS)",
    description="Parts that appear in no lineitem (anti join)",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    ORDER BY p_partkey
    """,
)
def join_anti_never_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@query(
    "join_nonequi_funnel",
    survey_ref="§2.5 joins (theta/range); P2 dispatch",
    description="Range self-join: purchases within 1h after a signup, per user",
    oracle="""
    SELECT s.user_id,
           s.event_id AS signup_event_id,
           COUNT(p.event_id) AS purchases_within_1h
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id
     AND p.ts > s.ts
     AND p.ts <= s.ts + INTERVAL 1 HOUR
    GROUP BY s.user_id, s.event_id
    ORDER BY s.user_id, s.event_id
    """,
)
def join_nonequi_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").alias("s")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    # equi key (user_id) + range predicate: Catalyst executes as a hash join
    # on user_id with the range as a post-filter — NOT a cartesian product.
    cond = ((F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") > F.col("s.ts"))
            & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 1 HOUR")))
    return (
        s.join(p, cond, "left")
        .groupBy(F.col("s.user_id").alias("user_id"),
                 F.col("s.event_id").alias("signup_event_id"))
        .agg(F.count(F.col("p.event_id")).alias("purchases_within_1h"))
        .orderBy("user_id", "signup_event_id")
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------

@query(
    "agg_rollup_nation_segment",
    survey_ref="§2.5 aggregations (rollup)",
    description="ROLLUP over (nation, mktsegment) with subtotals",
    oracle=f"""
    SELECT n_name, c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)
def agg_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             dsum(F.col("c_acctbal")).alias("total_balance"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("c_mktsegment"))
    )


@query(
    "agg_cube_status_priority",
    survey_ref="§2.5 aggregations (cube)",
    description="CUBE over (orderstatus, orderpriority)",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice")).alias("total_price"))
        .orderBy(F.asc_nulls_first("o_orderstatus"),
                 F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "agg_distinct_counts",
    survey_ref="§2.5 aggregations (distinct)",
    description="COUNT(DISTINCT) per group plus min/max",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # min/max of doubles are exact (no accumulation) — safe cross-engine.
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.min("l_quantity").alias("min_qty"),
             F.max("l_quantity").alias("max_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_having_big_customers",
    survey_ref="§2.5 aggregations (HAVING)",
    description="Group-filter: customers with >= 12 orders",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
)
def agg_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice")).alias("total_spend"))
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@query(
    "agg_approx_distinct",
    survey_ref="§2.5 aggregations (approx sketch)",
    # HLL sketch values are engine-specific, so the judged columns are the
    # exact distinct count plus a boolean asserting the HLL estimate landed
    # within 3× its configured relative standard deviation (rsd=0.05) —
    # deterministic for fixed data, and cross-engine comparable.
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS approx_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="approx_count_distinct (HLL) per return flag, error-bounded",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rsd = 0.05
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact_orders"),
             F.approx_count_distinct("l_orderkey", rsd).alias("_approx"))
        .select(
            "l_returnflag", "exact_orders",
            (F.abs(F.col("_approx") - F.col("exact_orders"))
             <= 3 * rsd * F.col("exact_orders")).alias("approx_within_bound"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_percentile",
    survey_ref="§2.5 aggregations (quantile sketch)",
    # like agg_approx_distinct: the sketch value is engine-specific, so the
    # judged columns are the EXACT interpolated quantiles plus a boolean
    # asserting the sketch landed within its accuracy guarantee — for
    # percentile_approx(accuracy=a) the rank error is bounded by n/a, so
    # the estimate must fall between the exact quantiles at rank ± n/a
    # (checked with 2× slack for interpolation at bucket edges).
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.50) AS exact_p50,
           quantile_cont(l_extendedprice, 0.95) AS exact_p95,
           TRUE AS sketch_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="percentile_approx sketch per return flag, error-bounded",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    accuracy = 10_000
    # percentile_approx's rank error is bounded by n/accuracy (quantile
    # fraction 1/accuracy). The sketch also returns an ACTUAL element while
    # exact percentile interpolates, so the bracket needs at least one
    # element-gap of slack: 1/accuracy + 1/n. A fixed 0.002 fraction covers
    # both terms for every group ≥ 1k rows (the smallest test SF) while
    # still failing loudly for a broken sketch (which lands whole quantile
    # ranges away).
    frac = 0.002
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.50)").alias("exact_p50"),
             F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
             F.expr(f"percentile(l_extendedprice, {0.50 - frac})").alias("_lo50"),
             F.expr(f"percentile(l_extendedprice, {min(1.0, 0.50 + frac)})").alias("_hi50"),
             F.expr(f"percentile(l_extendedprice, {0.95 - frac})").alias("_lo95"),
             F.expr(f"percentile(l_extendedprice, {min(1.0, 0.95 + frac)})").alias("_hi95"),
             F.expr(f"percentile_approx(l_extendedprice, 0.50, {accuracy})").alias("_a50"),
             F.expr(f"percentile_approx(l_extendedprice, 0.95, {accuracy})").alias("_a95"))
        .select("l_returnflag", "exact_p50", "exact_p95",
                (F.col("_a50").between(F.col("_lo50"), F.col("_hi50"))
                 & F.col("_a95").between(F.col("_lo95"), F.col("_hi95")))
                .alias("sketch_within_bound"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Window functions (batch forms of the reference's stateful ops are in
# plans/marketdata.py; these are the general-purpose window surface)
# ---------------------------------------------------------------------------

@query(
    "window_running_spend",
    survey_ref="§2.5 windows (running agg)",
    description="Per-customer running total of order value, ordered by date",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w)
             .cast("double").alias("running_spend"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "window_topk_orders_per_customer",
    survey_ref="§2.5 windows (rank/top-k); T3 batch form",
    description="Top-3 orders per customer by value (row_number <= 3)",
    bench=True,
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_lag_value_delta",
    survey_ref="§2.5 windows (lag/lead); T4/T5 building block",
    description="Per-user delta of event value vs previous event",
    oracle="""
    SELECT user_id, event_id, ts, value,
           value - LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS value_delta
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "ts", "value",
                  (F.col("value") - F.lag("value").over(w)).alias("value_delta"))
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "window_ntile_quartiles",
    survey_ref="§2.5 windows (ntile/rank family)",
    description="Account-balance quartiles within each nation",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS quartile,
           RANK() OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal, c_custkey) AS bal_rank
    FROM customer
    ORDER BY c_nationkey, c_acctbal, c_custkey
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_nationkey", "c_custkey", "c_acctbal",
                    F.ntile(4).over(w).alias("quartile"),
                    F.rank().over(w).alias("bal_rank"))
        .orderBy("c_nationkey", "c_acctbal", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# ---------------------------------------------------------------------------

@query(
    "topk_global_orders",
    survey_ref="§2.5 sort/limit (global top-k)",
    description="Top-20 orders by total price (TakeOrderedAndProject plan)",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k,
    # then a k-row merge on the driver — no global sort at any scale.
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "set_intersect_repeat_customers",
    survey_ref="§2.5 set ops (intersect)",
    description="Customers who ordered in both 1995 and 1996",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ORDER BY o_custkey
    """,
)
def set_intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return year(1995).intersect(year(1996)).orderBy("o_custkey")


@query(
    "set_except_churned_customers",
    survey_ref="§2.5 set ops (except)",
    description="Customers who ordered in 1995 but not in 1996",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ORDER BY o_custkey
    """,
)
def set_except_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    # subtract = EXCEPT (set semantics); exceptAll would keep multiplicity
    return year(1995).subtract(year(1996)).orderBy("o_custkey")


@query(
    "set_union_all_parties",
    survey_ref="§2.5 set ops (union) + distinct",
    description="Union of customer and supplier nation keys with role tag",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS role FROM customer
    UNION ALL
    SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS role FROM supplier
    ORDER BY role, nationkey
    """,
)
def set_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (_t(spark, sf_dir, "customer")
            .select(F.col("c_nationkey").alias("nationkey")).distinct()
            .withColumn("role", F.lit("customer")))
    sup = (_t(spark, sf_dir, "supplier")
           .select(F.col("s_nationkey").alias("nationkey")).distinct()
           .withColumn("role", F.lit("supplier")))
    return cust.unionByName(sup).orderBy("role", "nationkey")


@query(
    "pivot_status_by_priority",
    survey_ref="§2.5 pivot",
    description="Order counts pivoted: priority rows × status columns",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Scalar function surface (covers the reference's P5/P6 value decodes —
# /root/reference/polo_ws.py:94,100, real_guac.py:113 — generalized)
# ---------------------------------------------------------------------------

@query(
    "scalar_string_funcs",
    survey_ref="P5 decode; §2.5 scalar string funcs",
    description="regexp_extract / replace / substring / concat / case-map",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTRING(p_name, 1, 8)) AS name_prefix,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
           REPLACE(p_type, ' ', '-') AS type_slug,
           p_brand || '/' || p_type AS brand_type,
           LENGTH(p_name) AS name_len,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mirrors the reference's string rewrites (product-id '-'→'/' at
    # real_guac.py:113, side decode at polo_ws.py:100) on the fixture tables
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
            F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
            F.regexp_replace("p_type", " ", "-").alias("type_slug"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.length("p_name").alias("name_len"),
            F.when(F.col("p_size") < 10, "small")
             .when(F.col("p_size") < 30, "medium")
             .otherwise("large").alias("size_class"))
        .orderBy("p_partkey")
    )


@query(
    "scalar_date_funcs",
    survey_ref="P6 timestamps; §2.5 scalar date funcs",
    description="year/quarter/month/day extraction, trunc, formatting, datediff",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002
    FROM orders
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            # emitted as a string: Spark DATE reaches pandas as datetime.date
            # while DuckDB DATE/TIMESTAMP arrives as datetime64 — a
            # dtype-sensitive canonicalizer (the q12 failure class) would
            # hash them apart even though the values are equal
            F.date_format(F.date_trunc("month", F.col("o_orderdate")),
                          "yyyy-MM-dd").alias("order_month_start"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
            F.datediff(F.lit("2002-01-01 00:00:00").cast("timestamp"),
                       F.col("o_orderdate")).alias("days_to_2002"))
        .orderBy("o_orderkey")
    )


@query(
    "scalar_json_extract",
    survey_ref="P1 JSON deserialization (batch form)",
    description="JSON field extraction from the events.props payload",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS prop_k_mod
    FROM events
    ORDER BY event_id
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # batch analogue of the reference's per-frame json.loads
    # (/root/reference/real_guac.py:38): parse on read, extract typed fields
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_id", "event_type",
                  k.alias("prop_k"),
                  (k % 10).alias("prop_k_mod"))
        .orderBy("event_id")
    )


@query(
    "scalar_collect_sorted_list",
    survey_ref="§2.5 array funcs (collect/sort/join)",
    description="Deterministic string aggregation of segment membership",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def scalar_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
             F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


@query(
    "subquery_above_avg_balance",
    survey_ref="§2.5 scalar subquery",
    description="Customers above the global average account balance",
    oracle=f"""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer)
    ORDER BY c_custkey
    """,
)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    # expressed via spark.sql to evidence the SQL entry point + scalar subquery
    return spark.sql(f"""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer)
        ORDER BY c_custkey
    """)

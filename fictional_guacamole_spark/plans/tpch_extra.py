"""Additional TPC-H-shaped queries: conditional aggregation (Q12), ratio
of conditional sums (Q14), group-filter via semi join on aggregate (Q18),
and disjunctive multi-column predicates (Q19) — adapted to the fixture
schema (no shipmode/container columns; the predicate/aggregation shapes
are what's being evidenced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fictional_guacamole_spark.plans.compat import dsum, sql_dsum
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table


@query(
    "q12_priority_shipping",
    survey_ref="§2.5 conditional aggregation (TPC-H Q12 shape)",
    description="High/low-priority line counts per return flag (CASE inside SUM)",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


@query(
    "q14_promo_revenue_ratio",
    survey_ref="§2.5 ratio of conditional sums (TPC-H Q14 shape)",
    description="Share of revenue from one part brand bucket (percentage)",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_brand IN ('Brand#1','Brand#2','Brand#3') "
                             "THEN l_extendedprice * (1 - l_discount) "
                             "ELSE 0 END")}
           / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"), rev) \
             .otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev))
             .alias("promo_revenue_pct"))
    )


@query(
    "q18_large_orders",
    survey_ref="§2.5 semi join on aggregated subquery (TPC-H Q18 shape)",
    description="Customers holding orders whose total quantity exceeds 150",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


@query(
    "q4_late_shipment_orders",
    survey_ref="§2.5 correlated EXISTS with arithmetic (TPC-H Q4 shape)",
    description="Order counts by priority where some lineitem shipped >100 days late",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    # SQL form: Catalyst rewrites the correlated EXISTS into a left-semi
    # join on orderkey with the date arithmetic as the join residual
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@query(
    "q22_dormant_customers",
    survey_ref="§2.5 scalar subquery + anti join combo (TPC-H Q22 shape)",
    description="High-balance customers with no orders, bucketed by name suffix",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_dsum('c_acctbal')} / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0)
    SELECT substring(c_name, length(c_name), 1) AS name_digit,
           COUNT(*) AS n_custs,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY 1
    ORDER BY name_digit
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1)))
                    .alias("v")))
    rich = cust.join(F.broadcast(avg_bal)) \
               .filter(F.col("c_acctbal") > F.col("v"))
    dormant = rich.join(orders, rich.c_custkey == orders.o_custkey,
                        "left_anti")
    return (
        dormant.groupBy(
            F.substring(F.col("c_name"), -1, 1).alias("name_digit"))
        .agg(F.count(F.lit(1)).alias("n_custs"),
             dsum(F.col("c_acctbal")).alias("total_bal"))
        .orderBy("name_digit")
    )


@query(
    "q19_disjunctive_predicates",
    survey_ref="§2.5 disjunctive multi-column predicates (TPC-H Q19 shape)",
    description="Revenue under OR-of-ANDs bucket predicates (size × qty bands)",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
       OR (p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 16 AND 30)
       OR (p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 31 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 15))
        | (F.col("p_size").between(11, 25) & F.col("l_quantity").between(16, 30))
        | (F.col("p_size").between(26, 50) & F.col("l_quantity").between(31, 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )

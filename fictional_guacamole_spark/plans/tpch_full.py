"""The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q13, Q15, Q16, Q17,
Q20, Q21), adapted to the fixture schema.

The fixture has no ``partsupp`` table and no commit/receipt dates, so the
queries that lean on them are re-expressed over ``lineitem`` while keeping
the *plan shape* that each TPC-H query exists to exercise — correlated min
(Q2), nation market share over a 7-way join (Q8), profit rollup (Q9),
scalar-subquery HAVING (Q11), left-join count distribution (Q13), aggregate
= MAX scalar subquery (Q15), NOT-IN + distinct-count (Q16), correlated avg
threshold (Q17), nested semi-join chain (Q20), and EXISTS/NOT-EXISTS
self-joins (Q21). Cross-engine value parity uses the decimal-sum technique
from plans/compat.py throughout.

Scale posture: every dimension join (supplier/nation/region/part at TPC-H
cardinalities) is broadcast; fact-side aggregations fold partially
map-side; correlated subqueries are expressed so Catalyst decorrelates them
into semi/anti hash joins rather than per-row subplans (verified in
tests/test_plan_quality.py for the q21 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fictional_guacamole_spark.plans.compat import (
    DEC, dec_to_double_exact, dsum, sql_dec_to_double_exact, sql_dsum)
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table


@query(
    "q2_min_cost_supplier",
    survey_ref="§2.5 correlated-min subquery + snowflake join (TPC-H Q2 shape)",
    description="Cheapest regional supplier per mid-size part (min unit cost)",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    regional AS (
      SELECT l_partkey, l_suppkey, unit_cost, s_name, s_acctbal, n_name
      FROM cost
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part JOIN regional r ON p_partkey = r.l_partkey
    WHERE p_size BETWEEN 10 AND 20
      AND unit_cost = (SELECT MIN(unit_cost) FROM regional r2
                       WHERE r2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 without partsupp: the per-(part, supplier) offer becomes the
    minimum observed unit price in lineitem; the correlated scalar subquery
    (min cost within the region for that part) becomes a groupBy-min joined
    back on the part key — a hash join, not a per-row subplan.

    unit_cost is an IEEE division of identical doubles in both engines, so
    MIN and the equality filter are bit-exact without the decimal detour.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    regional = (cost
                .join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
                .join(F.broadcast(nation),
                      supp.s_nationkey == nation.n_nationkey)
                .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                      nation.n_regionkey == region.r_regionkey)
                .select("l_partkey", "unit_cost", "s_name", "s_acctbal",
                        "n_name"))
    min_cost = (regional.groupBy("l_partkey")
                .agg(F.min("unit_cost").alias("min_cost")))
    return (part.filter(F.col("p_size").between(10, 20))
            .join(regional, part.p_partkey == regional.l_partkey)
            .join(min_cost, "l_partkey")
            .filter(F.col("unit_cost") == F.col("min_cost"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                    "unit_cost")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


@query(
    "q8_nation_market_share",
    survey_ref="§2.5 market-share ratio over 7-way join (TPC-H Q8 shape)",
    description="One supplier nation's share of regional revenue per year",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
           / {sql_dsum('volume')} AS mkt_share
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: customer-side region filter, supplier-side nation share.
    All five dimensions broadcast; the only shuffles are the two fact-fact
    joins (lineitem⋈orders) and the final tiny groupBy on year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    n1 = nation.alias("n1")
    n2 = (nation.select(F.col("n_nationkey").alias("n2_key"),
                        F.col("n_name").alias("supp_nation")))
    rev = (li
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(n1),
                 cust.c_nationkey == F.col("n1.n_nationkey"))
           .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                 F.col("n1.n_regionkey") == region.r_regionkey)
           .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
           .select(F.year("o_orderdate").cast("int").alias("o_year"),
                   (F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))).alias("volume"),
                   "supp_nation"))
    share_vol = F.when(F.col("supp_nation") == "NATION_7",
                       F.col("volume")).otherwise(F.lit(0.0))
    return (rev.groupBy("o_year")
            .agg((dsum(share_vol) / dsum(F.col("volume")))
                 .alias("mkt_share"))
            .orderBy("o_year"))


@query(
    "q9_product_type_profit",
    survey_ref="§2.5 profit rollup by nation×year (TPC-H Q9 shape)",
    description="Per-nation, per-year profit on a part-name family",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)'
                     ' - p_retailprice * l_quantity * 0.01')} AS sum_profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 without partsupp: supply cost is modeled as 1% of the
    part's retail price per unit (the fixture has no ps_supplycost). The
    evidenced shape — LIKE-filtered part dimension pruning the fact scan,
    then a two-key rollup over a 5-way join — is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01))
    return (li
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(dsum(profit).alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


@query(
    "q11_important_stock",
    survey_ref="§2.5 scalar-subquery HAVING over aggregate (TPC-H Q11 shape)",
    description="Parts whose shipped value from a nation group beats a global fraction",
    oracle=f"""
    WITH value_by_part AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey IN (0, 1, 2, 3, 4)
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey,
           {sql_dec_to_double_exact('val')} AS part_value
    FROM value_by_part
    WHERE {sql_dec_to_double_exact('val')} >
          (SELECT {sql_dec_to_double_exact('SUM(val)')} * 0.001
           FROM value_by_part)
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 without partsupp: "stock value" becomes shipped
    extended-price value from suppliers in a 5-nation group; the HAVING
    threshold is a broadcast scalar (0.1% of the group total). The decimal
    sums convert through the exact split so the threshold comparison is
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1, 2, 3, 4))
    val = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("val")))
    total = val.agg(
        (dec_to_double_exact(F.sum("val")) * F.lit(0.001)).alias("threshold"))
    return (val.join(F.broadcast(total))
            .filter(dec_to_double_exact(F.col("val")) > F.col("threshold"))
            .select(F.col("l_partkey").alias("partkey"),
                    dec_to_double_exact(F.col("val")).alias("part_value"))
            .orderBy(F.desc("part_value"), "partkey"))


@query(
    "q13_order_count_distribution",
    survey_ref="§2.5 outer-join two-level aggregation (TPC-H Q13 shape)",
    description="Distribution of customers by order count (join-condition filter)",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the filter must live in the LEFT JOIN condition (a WHERE
    would silently drop zero-order customers). COUNT(o_orderkey) over the
    null-extended rows yields 0 for them — both engines agree."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "q15_top_supplier",
    survey_ref="§2.5 aggregate = scalar-MAX subquery (TPC-H Q15 shape)",
    description="Supplier(s) with the maximum quarterly revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the view becomes a cached-free CTE; revenue is the exact
    decimal sum converted to double, so `= MAX(...)` matches the same rows
    in both engines (ties included)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(dsum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount")))
                    .alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (revenue.join(F.broadcast(max_rev))
            .filter(F.col("total_revenue") == F.col("max_rev"))
            .join(F.broadcast(supp),
                  F.col("supplier_no") == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@query(
    "q16_supplier_part_variety",
    survey_ref="§2.5 NOT-IN anti join + distinct count (TPC-H Q16 shape)",
    description="Distinct supplier counts per part attribute bucket",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: partsupp becomes the distinct (partkey, suppkey) pairs in
    lineitem; the "complaints" NOT IN becomes negative-balance suppliers.
    s_suppkey is non-null, so NOT IN is exactly a broadcast anti join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("STANDARD%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (ps
            .join(F.broadcast(bad_supp),
                  ps.l_suppkey == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


@query(
    "q17_small_quantity_revenue",
    survey_ref="§2.5 correlated-average threshold (TPC-H Q17 shape)",
    description="Average yearly revenue lost to sub-average-quantity orders",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pa_partkey,
             {sql_dec_to_double_exact('SUM(CAST(l_quantity AS DECIMAL(25,6)))')}
             / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated AVG subquery decorrelates into a
    groupBy-average joined back on the part key. The average is the
    portable decimal-sum/count form so the 0.2× threshold comparison picks
    identical rows in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3")
    part_avg = (li.groupBy(F.col("l_partkey").alias("pa_partkey"))
                .agg((dec_to_double_exact(
                          F.sum(F.col("l_quantity").cast(DEC)))
                      / F.count("l_quantity")).alias("avg_qty")))
    return (li
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(part_avg, li.l_partkey == F.col("pa_partkey"))
            .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
            .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0))
                 .alias("avg_yearly")))


@query(
    "q20_excess_shippers",
    survey_ref="§2.5 nested aggregation semi-join chain (TPC-H Q20 shape)",
    description="Suppliers dominating any one small part's yearly volume",
    oracle=f"""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(25,6))) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM small_parts)
      GROUP BY l_partkey, l_suppkey),
    totals AS (
      SELECT l_partkey AS t_partkey,
             SUM(CAST(l_quantity AS DECIMAL(25,6))) AS tq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM small_parts)
      GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT l_suppkey
      FROM shipped JOIN totals ON l_partkey = t_partkey
      WHERE {sql_dec_to_double_exact('q')} >
            0.5 * {sql_dec_to_double_exact('tq')})
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 without partsupp: "excess stock" becomes "shipped more
    than half of a small part's 1996 volume". The nested-IN chain stays:
    part-name filter → per-(part,supplier) aggregate → per-part total →
    threshold semi join → supplier semi join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    small = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_name").like("small%")).select("p_partkey"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    li_small = li.join(F.broadcast(small),
                       li.l_partkey == F.col("p_partkey"), "left_semi")
    shipped = (li_small.groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q")))
    totals = (li_small.groupBy(F.col("l_partkey").alias("t_partkey"))
              .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("tq")))
    dominant = (shipped
                .join(totals, shipped.l_partkey == F.col("t_partkey"))
                .filter(dec_to_double_exact(F.col("q"))
                        > F.lit(0.5) * dec_to_double_exact(F.col("tq")))
                .select("l_suppkey").distinct())
    return (supp
            .join(dominant, supp.s_suppkey == dominant.l_suppkey,
                  "left_semi")
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .select("s_name", "n_name")
            .orderBy("s_name"))


@query(
    "q21_waiting_suppliers",
    survey_ref="§2.5 EXISTS + NOT-EXISTS self-joins (TPC-H Q21 shape)",
    description="Sole-late suppliers on multi-supplier finished orders",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 without receipt/commit dates: "kept waiting" is shipping
    more than 60 days after the order date. Expressed in SQL so Catalyst
    decorrelates the EXISTS into a left-semi and the NOT EXISTS into a
    left-anti self-join on the order key (the same rewrite q4 evidences;
    no per-row subplans survive)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
          JOIN orders ON o_orderkey = l1.l_orderkey
          JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """)

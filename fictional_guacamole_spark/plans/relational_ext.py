"""Second tranche of the relational surface: exact percentiles,
correlation from exact moments, additional TPC-H-shaped multi-joins,
null-handling and array scalar functions, correlated EXISTS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fictional_guacamole_spark.plans.compat import (
    dec_to_double_exact, dsum, sql_dec_to_double_exact, sql_dsum)
from fictional_guacamole_spark.plans.registry import query
from fictional_guacamole_spark.tables import load_table


@query(
    "agg_percentiles",
    survey_ref="§2.5 aggregations (exact ordered-set)",
    description="Exact interpolated median/quartiles per return flag",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (sort-based, linear interpolation) — verified
    bit-identical to DuckDB's quantile_cont. The approx_percentile sketch
    is the scale path; exact is the correctness baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
             F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
             F.expr("percentile(l_extendedprice, 0.75)").alias("p75_price"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_corr_price_discount",
    survey_ref="§2.5 aggregations (bivariate moments)",
    description="Pearson correlation from exact decimal co-moments",
    oracle=f"""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS xd,
             CAST(l_discount AS DECIMAL(9,6)) AS yd
      FROM lineitem),
    s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(xd) AS dsx, SUM(yd) AS dsy, SUM(xd * yd) AS dsxy,
             SUM(xd * xd) AS dsxx, SUM(yd * yd) AS dsyy
      FROM d GROUP BY l_returnflag),
    m AS (
      SELECT l_returnflag, n,
             {sql_dec_to_double_exact('dsx')} AS sx,
             {sql_dec_to_double_exact('dsy')} AS sy,
             {sql_dec_to_double_exact('dsxy')} AS sxy,
             {sql_dec_to_double_exact('dsxx')} AS sxx,
             {sql_dec_to_double_exact('dsyy')} AS syy
      FROM s)
    SELECT l_returnflag,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           AS corr_price_disc
    FROM m
    ORDER BY l_returnflag
    """,
)
def agg_corr_price_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr() computed from exact decimal moments (F.corr's streaming
    double accumulation is order-dependent, so it can't hash-match an
    oracle). Inputs are cast to decimal FIRST and multiplied in decimal:
    casting a large double *product* to decimal is itself inexact once
    |value|·10^scale exceeds 2^53 (price² ≈ 1e10 at scale 6 crosses it),
    and the two engines disagree in the last bit — exact decimal products
    sidestep the entire issue."""
    li = load_table(spark, sf_dir, "lineitem")
    xd = F.col("l_extendedprice").cast("decimal(18,2)")
    yd = F.col("l_discount").cast("decimal(9,6)")
    n = F.count(F.lit(1))
    sx = dec_to_double_exact(F.sum(xd))
    sy = dec_to_double_exact(F.sum(yd))
    sxy = dec_to_double_exact(F.sum(xd * yd))
    sxx = dec_to_double_exact(F.sum(xd * xd))
    syy = dec_to_double_exact(F.sum(yd * yd))
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx)
                                  * F.sqrt(n * syy - sy * sy))
    return (li.groupBy("l_returnflag")
            .agg(corr.alias("corr_price_disc"))
            .orderBy("l_returnflag"))


@query(
    "agg_regr_price_on_qty",
    survey_ref="§2.5 aggregations (per-group OLS regression)",
    description="OLS slope/intercept/R2 of price on quantity, exact co-moments",
    oracle=f"""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_quantity AS DECIMAL(12,2)) AS xd,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS yd
      FROM lineitem),
    s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(xd) AS dsx, SUM(yd) AS dsy, SUM(xd * yd) AS dsxy,
             SUM(xd * xd) AS dsxx, SUM(yd * yd) AS dsyy
      FROM d GROUP BY l_returnflag),
    m AS (
      SELECT l_returnflag, n,
             {sql_dec_to_double_exact('dsx')} AS sx,
             {sql_dec_to_double_exact('dsy')} AS sy,
             {sql_dec_to_double_exact('dsxy')} AS sxy,
             {sql_dec_to_double_exact('dsxx')} AS sxx,
             {sql_dec_to_double_exact('dsyy')} AS syy
      FROM s)
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM m
    ORDER BY l_returnflag
    """,
)
def agg_regr_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (regr_slope/regr_intercept/
    regr_r2 equivalents) from the same exact decimal co-moments as
    agg_corr_price_discount — the built-in regr_* aggregates stream
    doubles and are order-dependent, so they cannot hash-match across
    engines. Every double op downstream of the exact sums is written in
    the identical order on both sides, so the IEEE results are
    bit-identical. Map-side partial aggregation applies (one shuffle of
    5-tuples per group); at 100 TB this is scan-bound."""
    li = load_table(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(12,2)")
    yd = F.col("l_extendedprice").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    sx = dec_to_double_exact(F.sum(xd))
    sy = dec_to_double_exact(F.sum(yd))
    sxy = dec_to_double_exact(F.sum(xd * yd))
    sxx = dec_to_double_exact(F.sum(xd * xd))
    syy = dec_to_double_exact(F.sum(yd * yd))
    cov_n = n * sxy - sx * sy           # n^2 * cov — shared numerator
    var_x = n * sxx - sx * sx           # n^2 * var(x)
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return (li.groupBy("l_returnflag")
            .agg(n.alias("n"),
                 slope.alias("slope"),
                 ((sy - slope * sx) / n).alias("intercept"),
                 ((cov_n * cov_n) / (var_x * var_y)).alias("r2"))
            .orderBy("l_returnflag"))


@query(
    "q7_nation_volume",
    survey_ref="§2.5 joins (two dimension paths, OR pair filter)",
    description="Shipping volume between two nation pairs by year (TPC-H Q7 shape)",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
          OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"),
                    F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"),
                    F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE")))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return (
        joined.groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    survey_ref="§2.5 joins+agg+topk (TPC-H Q10 shape)",
    description="Top-20 customers by revenue lost to returned items",
    bench=True,
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey))
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "scalar_null_handling",
    survey_ref="§2.5 scalar funcs (null semantics)",
    description="coalesce / nullif / null-safe comparisons over a left join",
    oracle="""
    SELECT p_partkey,
           COALESCE(CAST(l_orderkey AS VARCHAR), 'never-ordered') AS order_ref,
           NULLIF(p_size, 25) AS size_or_null,
           (l_orderkey IS NULL) AS is_unordered,
           CASE WHEN l_quantity IS NULL THEN -1.0
                ELSE l_quantity END AS qty_filled
    FROM part LEFT JOIN (
        SELECT l_partkey, MIN(l_orderkey) AS l_orderkey,
               MIN(l_quantity) AS l_quantity
        FROM lineitem GROUP BY l_partkey) li
      ON p_partkey = li.l_partkey
    ORDER BY p_partkey
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_partkey")
          .agg(F.min("l_orderkey").alias("l_orderkey"),
               F.min("l_quantity").alias("l_quantity")))
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .select(
            "p_partkey",
            F.coalesce(F.col("l_orderkey").cast("string"),
                       F.lit("never-ordered")).alias("order_ref"),
            F.nullif(F.col("p_size"), F.lit(25)).alias("size_or_null"),
            F.col("l_orderkey").isNull().alias("is_unordered"),
            F.when(F.col("l_quantity").isNull(), -1.0)
             .otherwise(F.col("l_quantity")).alias("qty_filled"))
        .orderBy("p_partkey")
    )


@query(
    "scalar_array_funcs",
    survey_ref="§2.5 array funcs (construct/slice/search)",
    description="Array construction, slicing, membership, position, sort",
    oracle="""
    SELECT n_nationkey,
           array_to_string([n_name, CAST(n_regionkey AS VARCHAR)], '|')
             AS pair,
           array_to_string(list_sort(string_split(n_name, 'A')), '|')
             AS name_parts,
           list_contains(string_split(n_name, 'A'), 'N') AS has_n_fragment,
           len(string_split(n_name, 'A')) AS n_fragments,
           array_to_string(string_split(n_name, 'A')[1:2], '|') AS first_two
    FROM nation
    ORDER BY n_nationkey
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The array ops (construct / sort / contains / size / slice) are the
    # operator evidence; the judged projection serializes every array column
    # through array_join so the driver's comparator (pandas factorize, which
    # cannot hash list cells) sees only scalars.
    nat = load_table(spark, sf_dir, "nation")
    parts = F.split(F.col("n_name"), "A")
    staged = nat.select("n_nationkey", "n_name", "n_regionkey",
                        parts.alias("parts"))
    return (
        staged.select(
            "n_nationkey",
            F.array_join(
                F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
                "|").alias("pair"),
            F.array_join(F.sort_array(F.col("parts")), "|")
             .alias("name_parts"),
            F.array_contains(F.col("parts"), "N").alias("has_n_fragment"),
            F.size(F.col("parts")).alias("n_fragments"),
            F.array_join(F.slice(F.col("parts"), 1, 2), "|")
             .alias("first_two"))
        .orderBy("n_nationkey")
    )


@query(
    "window_first_last_nth",
    survey_ref="§2.5 windows (first/last/nth value)",
    description="First, latest, and second order values per customer frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_spend,
           LAST_VALUE(o_totalprice) OVER w AS latest_spend,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    orders = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_spend"),
            F.last("o_totalprice").over(w).alias("latest_spend"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_spend"))
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "agg_arg_extremes",
    survey_ref="§2.5 aggregations (max_by/min_by)",
    description="Argmax/argmin: each nation's richest and poorest customer",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, c_acctbal * 1e7 - c_custkey) AS richest,
           min_by(c_name, c_acctbal * 1e7 - c_custkey) AS poorest,
           MAX(c_acctbal) AS top_balance
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # composite numeric key: acctbal dominates (2-decimal steps × 1e7 ≫
    # custkey range), ties broken deterministically by lowest custkey —
    # portable where DuckDB lacks multi-key max_by
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_acctbal") * F.lit(1e7) - F.col("c_custkey")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.max_by("c_name", key).alias("richest"),
             F.min_by("c_name", key).alias("poorest"),
             F.max("c_acctbal").alias("top_balance"))
        .orderBy("c_nationkey")
    )


@query(
    "agg_mode_clerk_bucket",
    survey_ref="§2.5 aggregations (statistical MODE per group)",
    description="Modal order priority per 10-way customer bucket, "
                "deterministic tie-break",
    oracle="""
    SELECT bucket, o_orderpriority AS modal_priority, n
    FROM (
      SELECT bucket, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY n DESC, o_orderpriority) AS rk
      FROM (
        SELECT o_custkey % 10 AS bucket, o_orderpriority,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2))
    WHERE rk = 1
    ORDER BY bucket
    """,
)
def agg_mode_clerk_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group — the one classic aggregate the family
    still lacked (SQL:2023 ``mode()``; Spark has no built-in, and an
    engine-native ``mode`` would tie-break nondeterministically anyway).
    Expressed as the canonical two-level shape: count per (group, value)
    — partial-aggregated, so the shuffle carries one row per distinct
    pair — then a per-group argmax window with an explicit (count desc,
    value) tie-break that makes the judged hash deterministic."""
    from pyspark.sql import Window
    orders = load_table(spark, sf_dir, "orders")
    counts = (orders
              .groupBy((F.col("o_custkey") % 10).alias("bucket"),
                       "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("bucket").orderBy(
        F.desc("n"), F.asc("o_orderpriority"))
    return (counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("bucket",
                    F.col("o_orderpriority").alias("modal_priority"), "n")
            .orderBy("bucket"))


@query(
    "set_union_missing_columns",
    survey_ref="§2.5 set ops (unionByName allowMissingColumns)",
    description="Schema-evolved union: missing columns null-padded by name",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name,
           c_mktsegment AS segment, CAST(NULL AS DOUBLE) AS acctbal
    FROM customer WHERE c_custkey <= 50
    UNION ALL
    SELECT s_suppkey, s_name, CAST(NULL AS VARCHAR), s_acctbal
    FROM supplier
    ORDER BY party_name
    """,
)
def set_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 50)
            .select(F.col("c_custkey").alias("party_key"),
                    F.col("c_name").alias("party_name"),
                    F.col("c_mktsegment").alias("segment")))
    sup = (load_table(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").alias("party_key"),
                   F.col("s_name").alias("party_name"),
                   F.col("s_acctbal").alias("acctbal")))
    return (cust.unionByName(sup, allowMissingColumns=True)
            .orderBy("party_name"))


@query(
    "scalar_null_safe_eq",
    survey_ref="§2.5 null-safe equality (<=>)",
    description="Null-safe comparison: NULL <=> NULL is true, not null",
    oracle="""
    SELECT p_partkey,
           (size_a IS NOT DISTINCT FROM size_b) AS same_bucket,
           (size_a = size_b) AS naive_eq
    FROM (SELECT p_partkey,
                 NULLIF(p_size, 25) AS size_a,
                 NULLIF(CAST(p_partkey % 50 AS INTEGER), 25) AS size_b
          FROM part)
    ORDER BY p_partkey
    """,
)
def scalar_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    staged = part.select(
        "p_partkey",
        F.nullif(F.col("p_size"), F.lit(25)).alias("size_a"),
        F.nullif((F.col("p_partkey") % 50).cast("int"), F.lit(25))
         .alias("size_b"))
    return (
        staged.select(
            "p_partkey",
            F.col("size_a").eqNullSafe(F.col("size_b")).alias("same_bucket"),
            (F.col("size_a") == F.col("size_b")).alias("naive_eq"))
        .orderBy("p_partkey")
    )


@query(
    "scalar_map_funcs",
    survey_ref="§2.5 map funcs (JSON → map → keys/values/lookup)",
    description="Parse props JSON to a map; extract keys, values, lookups",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), '|') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_absent
    FROM events
    ORDER BY event_id
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # map_keys is the operator evidence; the judged column serializes the
    # (sorted, so key order is engine-independent) key list to a string so
    # the driver's pandas-based comparator can hash it.
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    staged = ev.select("event_id", m.alias("m"))
    return (
        staged.select(
            "event_id",
            F.array_join(F.sort_array(F.map_keys(F.col("m"))), "|")
             .alias("prop_keys"),
            F.element_at(F.col("m"), "k").alias("k_value"),
            F.element_at(F.col("m"), "missing").isNull()
             .alias("missing_absent"))
        .orderBy("event_id")
    )


@query(
    "set_intersect_all_quantities",
    survey_ref="§2.5 set ops (INTERSECT ALL, multiset semantics)",
    description="Quantity values common to both return flags, with multiplicity",
    oracle="""
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    ORDER BY l_quantity
    """,
)
def set_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.filter(F.col("l_returnflag") == "R").select("l_quantity")
    return a.intersectAll(r).orderBy("l_quantity")


@query(
    "join_pure_theta",
    survey_ref="§2.5 joins (pure theta, no equi key → BNLJ)",
    description="Nation × region pairs under an inequality-only condition",
    oracle="""
    SELECT n_name, r_name
    FROM nation JOIN region ON n_regionkey <> r_regionkey
    ORDER BY n_name, r_name
    """,
)
def join_pure_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuinely key-less theta join compiles to broadcast nested-loop —
    acceptable ONLY when one side is tiny (region: 5 rows at any SF).
    The engine's rule: theta joins must have a broadcastable side or be
    rewritten with an equi component (see join_nonequi_funnel)."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg),
                 nat.n_regionkey != reg.r_regionkey)
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    )


@query(
    "subquery_correlated_min",
    survey_ref="§2.5 correlated scalar-aggregate subquery (TPC-H Q2 shape)",
    description="Suppliers holding their nation's minimum account balance",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier s
    WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY s_suppkey
    """,
)
def subquery_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql("""
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier s
        WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey
    """)


@query(
    "window_percent_rank",
    survey_ref="§2.5 windows (distribution functions)",
    description="percent_rank and cume_dist of order value within priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_orderpriority", "o_orderkey",
                      F.percent_rank().over(w).alias("pct_rank"),
                      F.cume_dist().over(w).alias("cume"))
        .orderBy("o_orderpriority", "o_orderkey")
    )


@query(
    "text_edit_distance",
    survey_ref="extensions: fuzzy string matching (levenshtein)",
    description="Edit distance between document prefixes for a probe set",
    oracle="""
    WITH probe AS (
      SELECT doc_id, substring(text, 1, 40) AS prefix
      FROM documents WHERE doc_id < 20)
    SELECT p.doc_id AS doc_a, c.doc_id AS doc_b,
           levenshtein(p.prefix, substring(c.text, 1, 40)) AS edit_dist
    FROM probe p JOIN documents c ON p.doc_id < c.doc_id
    WHERE levenshtein(p.prefix, substring(c.text, 1, 40)) <= 20
    ORDER BY doc_a, doc_b
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded fuzzy matching: edit distance over fixed-length prefixes of
    a probe set — the verification kernel for fuzzy dedup (candidate
    generation at scale comes from LSH buckets, same as Jaccard)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = (docs.filter(F.col("doc_id") < 20)
             .select(F.col("doc_id").alias("doc_a"),
                     F.substring("text", 1, 40).alias("prefix")))
    cand = docs.select(F.col("doc_id").alias("doc_b"),
                       F.substring("text", 1, 40).alias("c_prefix"))
    return (
        F.broadcast(probe).crossJoin(cand)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.levenshtein(F.col("prefix"), F.col("c_prefix"))
                 .alias("edit_dist"))
        .filter(F.col("edit_dist") <= 20)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "subquery_exists_correlated",
    survey_ref="§2.5 correlated EXISTS subquery",
    description="Suppliers with at least one high-value shipment (EXISTS)",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_extendedprice > 90000)
    ORDER BY s_suppkey
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey
                        AND l.l_extendedprice > 90000)
        ORDER BY s_suppkey
    """)


@query(
    "scalar_variant_funcs",
    survey_ref="§2.5 semi-structured Variant type (Spark 4 parse_json)",
    description="VariantType field access over the events.props payload",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    ORDER BY event_id
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VariantType: ``parse_json`` builds the binary variant
    once, then typed ``variant_get`` paths extract fields without
    re-parsing the JSON text per access — at scan scale this is the
    replacement for repeated get_json_object over the same payload.
    The judged projection is scalar-typed (the variant itself never
    reaches the result schema); the DuckDB oracle replays the same
    extractions over the raw JSON."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    staged = ev.select("event_id", v.alias("__v"))
    return (
        staged.select(
            "event_id",
            F.variant_get(F.col("__v"), "$.k", "bigint").alias("k_int"),
            F.variant_get(F.col("__v"), "$.k", "string").alias("k_str"),
            F.try_variant_get(F.col("__v"), "$.missing", "bigint")
             .alias("k_missing"),
            F.variant_get(F.col("__v"), "$.k", "string").isNotNull()
             .alias("has_k"))
        .orderBy("event_id")
    )


@query(
    "unpivot_lineitem_measures",
    survey_ref="§2.5 pivot: unpivot/melt (wide → long)",
    description="The four lineitem measures melted to (metric, value) "
                "rows, aggregated per metric",
    oracle=f"""
    SELECT 'l_discount' AS metric, COUNT(l_discount) AS n,
           {sql_dsum('l_discount')} AS total FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(l_extendedprice),
           {sql_dsum('l_extendedprice')} FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(l_quantity),
           {sql_dsum('l_quantity')} FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(l_tax), {sql_dsum('l_tax')} FROM lineitem
    ORDER BY metric
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot's inverse — the wide→long reshape (``DataFrame.unpivot``,
    SQL UNPIVOT): each lineitem row fans out to one row per measure
    column, then a per-metric rollup. Unpivot itself is a map-side
    projection (generate, no shuffle); only the rollup aggregates — at
    100 TB the reshape costs zero network, and the 4× row amplification
    happens inside each task."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=[], values=["l_quantity", "l_extendedprice",
                        "l_discount", "l_tax"],
        variableColumnName="metric", valueColumnName="val")
    return (melted.groupBy("metric")
            .agg(F.count("val").alias("n"), dsum(F.col("val")).alias("total"))
            .orderBy("metric"))


ROLLING_WINDOW_S = 7 * 86400  # 7 days in seconds


@query(
    "window_rolling_7d_spend",
    survey_ref="§2.5 windows: interval rangeBetween (time-based rolling)",
    description="Per-customer rolling 7-day order spend via a RANGE "
                "window frame (value-based, not row-based)",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           {sql_dec_to_double_exact(
               "SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER ("
               "PARTITION BY o_custkey "
               "ORDER BY CAST(epoch(o_orderdate) AS BIGINT) "
               f"RANGE BETWEEN {7 * 86400} PRECEDING AND CURRENT ROW)")}
             AS spend_7d
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_rolling_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregation — ``rangeBetween`` on the ORDER
    value (epoch seconds), NOT ``rowsBetween`` on positions: every order
    sums the customer's spend in the preceding 7 days regardless of how
    many orders that spans, and ties (same-day orders) are frame peers on
    both engines by RANGE semantics. One shuffle on the customer key; the
    in-frame sum is decimal so the judged hash is order-insensitive."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    frame = (W.partitionBy("o_custkey")
             .orderBy(F.col("o_orderdate").cast("long"))
             .rangeBetween(-ROLLING_WINDOW_S, 0))
    spend = dec_to_double_exact(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(frame))
    return (o.select("o_orderkey", "o_custkey", "o_orderdate",
                     spend.alias("spend_7d"))
            .orderBy("o_custkey", "o_orderdate", "o_orderkey"))

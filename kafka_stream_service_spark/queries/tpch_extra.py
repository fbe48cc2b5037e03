"""Further TPC-H-shaped coverage (Q2/Q7/Q9/Q13/Q15/Q16/Q17/Q18/Q19/Q22
analogues, adapted to the fixture's columns — the fixtures carry no
ps_supplycost / comments / phones, so cost and filter stand-ins are noted
per query). All revenue math decimal-exact (queries/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import tables
from ._util import REVENUE_SQL, dec, dsum, revenue_expr
from .registry import query


@query(
    "q_min_balance_supplier_per_region",
    oracle="""
    WITH ranked AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name, r_name,
             ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY s_acctbal, s_suppkey) AS rn
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    )
    SELECT r_name, s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal, n_name
    FROM ranked WHERE rn = 1
    """,
    tags=("tpch", "window", "join"),
)
def q_min_balance_supplier_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per region; acctbal stands in for
    ps_supplycost): correlated-min via per-region window rank."""
    t = tables(spark, sf_dir)
    joined = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = W.partitionBy("r_name").orderBy("s_acctbal", "s_suppkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("r_name", "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("acctbal"), "n_name")
    )


@query(
    "q_volume_shipping_nation_pairs",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1','NATION_2') AND cn.n_name IN ('NATION_1','NATION_2')
      AND sn.n_name <> cn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join", "agg"),
)
def q_volume_shipping_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year (nation joined
    twice under different roles)."""
    t = tables(spark, sf_dir)
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nations = ("NATION_1", "NATION_2")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            F.col("supp_nation").isin(*nations)
            & F.col("cust_nation").isin(*nations)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(revenue_expr(), "revenue"))
    )


@query(
    "q_product_profit_by_nation_year",
    oracle=f"""
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM({REVENUE_SQL}
                    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(3,1))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, 2
    """,
    tags=("tpch", "join", "agg"),
)
def q_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation-per-year profit for a product family
    (0.6 x retailprice stands in for ps_supplycost)."""
    t = tables(spark, sf_dir)
    cost = (
        dec("p_retailprice") * dec("l_quantity", 18, 2) * F.lit(0.6).cast("decimal(3,1)")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(revenue_expr() - cost).cast("double").alias("profit"))
    )


@query(
    "q_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "outer", "agg"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a filtered left outer join."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_top_supplier_by_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({REVENUE_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON supplier_no = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue (max
    selected on the exact DECIMAL total, so ties/equality are exact)."""
    t = tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(revenue_expr()).alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "q_supplier_cnt_by_part_attrs",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'BRAND_0'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "subquery", "distinct"),
)
def q_supplier_cnt_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attributes with a
    NOT IN exclusion (negative-balance suppliers stand in for the
    complaints filter)."""
    t = tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = t["part"].filter(
        (F.col("p_brand") != "BRAND_0") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        t["lineitem"]
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS pk, 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avgq ON l_partkey = pk
    WHERE p_brand = 'BRAND_1' AND l_quantity < half_avg
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-half-average-quantity orders (correlated
    avg subquery decorrelated into a join; the comparison operand is
    the identical double expression on both engines)."""
    t = tables(spark, sf_dir)
    avgq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (F.lit(0.5) * (F.sum(dec("l_quantity", 18, 2)).cast("double") / F.count(F.lit(1))))
            .alias("half_avg")
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_brand") == "BRAND_1")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(avgq, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(dec("l_extendedprice")) / F.lit(7.0).cast("decimal(3,1)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    tags=("tpch", "having", "join"),
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders (HAVING on an exact
    decimal quantity sum, then enrich)."""
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("_tq"))
        .filter(F.col("_tq") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("_tq").cast("double").alias("total_qty"),
        )
    )


@query(
    "q_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'BRAND_1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'BRAND_2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("tpch", "filter", "join"),
)
def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join (tests
    predicate normalization/pushdown through a join)."""
    t = tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "BRAND_1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "BRAND_2") & F.col("p_size").between(5, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 50))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(revenue_expr(), "revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(CAST(c_acctbal AS DOUBLE)) AS m FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_custkey % 7 AS BIGINT) AS cust_group,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_custkey % 7 IN (1, 3, 5)
      AND c_acctbal > m
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY 1
    """,
    tags=("tpch", "subquery", "anti"),
)
def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: promising idle customers (custkey-group stands in
    for phone country codes), above-average balance, no large orders (conditional anti
    join + scalar subquery; the unconditional variant is empty at sf0.01
    because every customer has orders)."""
    t = tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT CAST(c_custkey % 7 AS BIGINT) AS cust_group,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_custkey % 7 IN (1, 3, 5)
          AND c_acctbal > (SELECT AVG(CAST(c_acctbal AS DOUBLE)) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY 1
        """
    )

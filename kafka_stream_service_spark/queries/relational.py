"""Relational core: scan -> filter -> join -> aggregate -> sort (SURVEY.md §2.2).

Scale notes (100 TB design intent, verified on the local plans with
``.explain``):

- dimension tables (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast`` so fact-side scans never shuffle for these joins;
- fact-fact joins (lineitem x orders) shuffle on the join key once and AQE
  handles skew;
- aggregates are expressed so Spark plans partial (map-side) aggregation
  before the shuffle — no driver-side work anywhere;
- filters are plain column predicates, so they push into the parquet scan
  (PushedFilters) and prune columns (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from ._util import REVENUE_SQL, davg, dec, dsum, revenue_expr
from .registry import query


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM({REVENUE_SQL} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby", "tpch"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: 2-col group-by, 8 aggregates.

    Partial aggregation happens map-side; only 6 groups shuffle.
    """
    li = tables(spark, sf_dir)["lineitem"]
    disc_price = revenue_expr()
    charge = disc_price * (F.lit(1) + dec("l_tax", 4, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity", 18, 2), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(dec("l_quantity", 18, 2), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec("l_discount", 4, 2), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_revenue_by_nation",
    oracle=f"""
    SELECT n_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "flagship"),
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fact-fact join + broadcast dims, revenue per customer nation."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue_expr(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q03_top_orders_by_revenue",
    oracle=f"""
    SELECT l_orderkey, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue, o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY SUM({REVENUE_SQL}) DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q03_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: segment filter, 3-way join, top-10 by revenue.

    Ranking happens on the exact DECIMAL sum (deterministic), surfaced as
    DOUBLE. Planned as TakeOrdered (no global sort materialization).
    """
    t = tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue_expr()).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.col("_rev_dec").cast("double").alias("revenue"), "o_orderdate")
    )


@query(
    "q05_regional_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q05_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join, local-supplier revenue per nation."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nr = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue_expr(), "revenue"))
    )


@query(
    "q06_forecast_revenue_filter",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch"),
)
def q06_forecast_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: selective conjunctive filter (pushed to parquet) + global agg."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(dec("l_extendedprice") * dec("l_discount", 4, 2), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM({REVENUE_SQL}) DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: customers who returned items, top 20 by lost revenue."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue_expr()).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", F.col("_rev_dec").cast("double").alias("revenue"), "n_name")
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(l_orderkey) AS n_matched,
           CAST(SUM(COALESCE(CAST(l_quantity AS DECIMAL(18,2)), 0)) AS DOUBLE) AS sum_qty
    FROM orders
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) li ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "outer"),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched orders; null-aware aggregates."""
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_quantity") > 45)
    return (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_orderkey").alias("n_matched"),
            F.sum(F.coalesce(dec("l_quantity", 18, 2), F.lit(0))).cast("double").alias("sum_qty"),
        )
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_orders AS (
           SELECT o_custkey, COUNT(*) AS n_orders FROM orders
           WHERE o_totalprice > 150000 GROUP BY o_custkey)
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_orders,
           (c_custkey IS NOT NULL) AS has_cust,
           (o_custkey IS NOT NULL) AS has_orders
    FROM big_cust FULL OUTER JOIN big_orders ON c_custkey = o_custkey
    """,
    tags=("join", "outer"),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered sides with null indicators."""
    t = tables(spark, sf_dir)
    bc = t["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    bo = (
        t["orders"]
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return bc.join(bo, F.col("c_custkey") == F.col("o_custkey"), "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        "n_orders",
        F.col("c_custkey").isNotNull().alias("has_cust"),
        F.col("o_custkey").isNotNull().alias("has_orders"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one big order."""
    t = tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal"), "sum_acctbal"),
        )
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY n_name
    """,
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no high-value order
    (> 300000), per nation. Every fixture customer has SOME order, so the
    anti-join must be against the filtered order set for the sf0.01
    result to be non-empty (30 customers) — an always-empty result would
    mask a broken join."""
    t = tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, COUNT(*) AS n_pairs, CAST(SUM(n_nationkey) AS BIGINT) AS sum_nkey
    FROM region CROSS JOIN nation
    GROUP BY r_name
    """,
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (bounded: 5 x 25)."""
    t = tables(spark, sf_dir)
    return (
        t["region"]
        .crossJoin(F.broadcast(t["nation"]))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("n_nationkey").cast("bigint")).alias("sum_nkey"),
        )
    )


@query(
    "q_join_theta_range",
    oracle="""
    SELECT n_name, COUNT(*) AS n_pairs
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
    JOIN nation ON s.s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "theta"),
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi-key on nation plus a range predicate on balances.

    The equi part keeps it a hash/sort-merge join (the range predicate is a
    post-join filter in the plan) — not a BNLJ — so it scales.
    """
    t = tables(spark, sf_dir)
    s = t["supplier"]
    c = t["customer"]
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .join(F.broadcast(t["nation"]), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q_agg_global_stats",
    oracle="""
    WITH d AS (SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
                      CAST(round(l_extendedprice * 100) AS HUGEINT) AS cb,
                      l_orderkey
               FROM lineitem)
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      CAST(MIN(p) AS DOUBLE) AS min_price,
      CAST(MAX(p) AS DOUBLE) AS max_price,
      CAST(SUM(p) AS DOUBLE) AS sum_price,
      CAST(SUM(p) AS DOUBLE) / COUNT(*) AS avg_price,
      sqrt(CAST(COUNT(*) * SUM(cb*cb) - SUM(cb) * SUM(cb) AS DOUBLE)
           / (COUNT(*) * (COUNT(*) - 1))) / 100 AS stddev_price
    FROM d
    """,
    tags=("agg", "global"),
)
def q_agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregates incl. exact count-distinct and stddev.

    stddev: the variance numerator n*Σc² - (Σc)² is computed ENTIRELY in
    exact wide-integer arithmetic over cents (decimal(38,0) here,
    HUGEINT in the oracle) — the two sums cancel catastrophically, so
    any representation rounding BEFORE the subtraction (e.g. the earlier
    decimal→double casts) diverges in the last ulps at sf0.1's 600k rows.
    After the exact subtraction there is one double division + sqrt,
    identical IEEE ops on both engines at every SF.
    """
    li = tables(spark, sf_dir)["lineitem"]
    p = dec("l_extendedprice")
    cb = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    wide = "decimal(38,0)"
    sum_c = F.sum(cb.cast(wide))
    sum_cc = F.sum((cb * cb).cast(wide))  # cb^2 <= ~1.1e14, fits bigint
    sum_p = F.sum(p).cast("double")
    n = F.count(F.lit(1))
    var_num = (n.cast(wide) * sum_cc - sum_c * sum_c).cast("double")
    return li.agg(
        n.alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min(p).cast("double").alias("min_price"),
        F.max(p).cast("double").alias("max_price"),
        sum_p.alias("sum_price"),
        (sum_p / n).alias("avg_price"),
        (F.sqrt(var_num / (n * (n - F.lit(1))).cast("double")) / 100).alias("stddev_price"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
    tags=("agg", "having"),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with post-aggregation HAVING filter."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(dec("l_quantity", 18, 2), "total_qty"),
        )
        .filter(F.col("n_items") > 550)
    )


@query(
    "q_agg_first_last",
    oracle="""
    SELECT o_custkey,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           arg_min(o_orderkey, epoch_us(o_orderdate) + o_orderkey) AS first_orderkey,
           arg_max(o_orderkey, epoch_us(o_orderdate) + o_orderkey) AS last_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "firstlast"),
)
def q_agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max + arg-min/arg-max (first/last by a total order).

    The arg functions use a unique composite key (orderdate + orderkey as
    microsecond jitter) so the answer is deterministic in both engines.
    """
    o = tables(spark, sf_dir)["orders"]
    tot = F.unix_micros(F.col("o_orderdate").cast("timestamp")) + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.min_by("o_orderkey", tot).alias("first_orderkey"),
        F.max_by("o_orderkey", tot).alias("last_orderkey"),
    )

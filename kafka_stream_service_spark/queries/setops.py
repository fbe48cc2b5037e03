"""Sort / limit / set operations / distinct / rollup / cube / pivot
(SURVEY.md §2.2 "Sort / limit / set ops" + "Aggregation" grouping extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec, dsum
from .registry import query


@query(
    "q_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("sort", "limit"),
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (no full sort/shuffle
    materialization — each partition keeps k, driver merges k*p rows)."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"), "o_orderstatus")
    )


@query(
    "q_union_all",
    oracle="""
    SELECT keysrc, nationkey, COUNT(*) AS n FROM (
      SELECT 'customer' AS keysrc, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supplier' AS keysrc, s_nationkey AS nationkey FROM supplier
    ) GROUP BY keysrc, nationkey
    """,
    tags=("setop", "union"),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) via unionByName, then group."""
    t = tables(spark, sf_dir)
    c = t["customer"].select(F.lit("customer").alias("keysrc"), F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.lit("supplier").alias("keysrc"), F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("keysrc", "nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "union"),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union (UNION) of customer and supplier nation keys."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select("s_nationkey"))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    tags=("setop", "intersect"),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: big-spending customers that also hold high balances."""
    t = tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    b = t["customer"].filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT p_brand AS brand FROM part
    EXCEPT
    SELECT p_brand FROM part WHERE p_size > 20
    """,
    tags=("setop", "except"),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct difference): brands with no large-size part."""
    p = tables(spark, sf_dir)["part"]
    return (
        p.select(F.col("p_brand").alias("brand"))
        .subtract(p.filter(F.col("p_size") > 20).select("p_brand"))
    )


@query(
    "q_except_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 49
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49 AND l_returnflag = 'R'
    """,
    tags=("setop", "except"),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) preserving multiplicities."""
    li = tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_quantity") >= 49).select(F.col("l_suppkey").alias("suppkey"))
    b = (
        li.filter((F.col("l_quantity") >= 49) & (F.col("l_returnflag") == "R"))
        .select(F.col("l_suppkey").alias("suppkey"))
    )
    return a.exceptAll(b)


@query(
    "q_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity = 1
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.09
    """,
    tags=("setop", "intersect"),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection) with multiplicities."""
    li = tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_quantity") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_discount") >= 0.09).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@query(
    "q_distinct_multi",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem WHERE l_quantity <= 3
    """,
    tags=("distinct",),
)
def q_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column DISTINCT (dropDuplicates on a projection)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_quantity") <= 3)
        .select("l_returnflag", "l_linestatus", F.col("l_quantity").cast("bigint").alias("qty"))
        .dropDuplicates()
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region -> nation -> grand total."""
    t = tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"), dsum(dec("c_acctbal"), "sum_bal")
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag x linestatus (all grouping sets)."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(dec("l_quantity", 18, 2), "sum_qty")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (segment totals + nation totals in one pass)."""
    t = tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
      CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT linestatus into columns (explicit value list keeps one pass)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity", 18, 2)).cast("double"))
    )

"""Window (analytic) functions: ranking, lag/lead, frames (SURVEY.md §2.2).

Every ORDER BY inside a window uses a total order (unique tiebreak column)
so results are deterministic and oracle-exact. Window partitioning keys are
the natural distribution keys (custkey/suppkey/user_id) — at 100 TB these
shuffle once on the partition key, state stays bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec
from .registry import query


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number over partition)."""
    o = tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"), "rn")
    )


@query(
    "q_window_rank_dense_ntile",
    oracle="""
    SELECT p_partkey, p_brand,
      RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS price_rank,
      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS price_dense_rank,
      NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS price_quartile,
      CAST(PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS DOUBLE) AS price_pct_rank
    FROM part
    """,
    tags=("window", "rank"),
)
def q_window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank within brand."""
    p = tables(spark, sf_dir)["part"]
    w = W.partitionBy("p_brand").orderBy("p_retailprice")
    wt = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("price_quartile"),
        F.percent_rank().over(w).alias("price_pct_rank"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
           OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
    tags=("window", "frame"),
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum/count per supplier over a total ship order."""
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity", 18, 2)).over(w).cast("double").alias("running_qty"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(lag(value) OVER w AS DOUBLE) AS prev_value,
      CAST(lead(value) OVER w AS DOUBLE) AS next_value,
      CAST(value - COALESCE(lag(value) OVER w, value) AS DOUBLE) AS delta,
      epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "laglead"),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation per user over event time."""
    e = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        prev_v.cast("double").alias("prev_value"),
        F.lead("value").over(w).cast("double").alias("next_value"),
        (F.col("value") - F.coalesce(prev_v, F.col("value"))).cast("double").alias("delta"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("us_since_prev"),
    )


@query(
    "q_window_sliding_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
           OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS avg_price_4,
      CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2)))
           OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS max_price_4
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
    tags=("window", "frame"),
)
def q_window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 4-row frame aggregates per supplier."""
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(dec("l_extendedprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "avg_price_4"
        ),
        F.max(dec("l_extendedprice")).over(w).cast("double").alias("max_price_4"),
    )


@query(
    "q_window_first_last_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
      FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
      LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_orderkey,
      NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "firstlast"),
)
def q_window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over customer order history."""
    o = tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(wfull).alias("last_orderkey"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_orderkey"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                     RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_similar
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window) over order price per customer."""
    o = tables(spark, sf_dir)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum_similar"),
    )

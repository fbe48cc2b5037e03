"""Round-7 operator batch 14: native XML source/sink and the ANSI
``try_*`` arithmetic family.

- q_xml_roundtrip: Spark 4 ships the (formerly spark-xml) StAX reader
  built in — the last bundled file format without a roundtrip row
  (parquet/ORC/CSV/JSON/Avro-binary already have one).
- q_try_arithmetic: ANSI mode is the Spark 4 default, so overflow and
  division-by-zero THROW unless the try_* forms are used — certifying
  their NULL-on-error semantics is dirty-data safety for every
  downstream pipeline that adopts ANSI.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from ._util import work_dir
from .registry import query


@query(
    "q_xml_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("source", "xml", "format", "round7"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink coverage (Spark 4 native StAX reader, the
    spark-xml lineage): write the events table as XML row documents and
    aggregate from the XML scan. The oracle aggregates the original
    parquet — a hash match proves the XML trip is lossless for longs,
    doubles, strings, and timestamps (the reader infers types back from
    the text forms; value goes through DECIMAL so the re-parsed double
    aggregates exactly).

    Scale shape: XML is a row-tag text format — no column pruning, no
    predicate pushdown, ~5-10x parquet scan cost; the roundtrip exists
    for interchange parity, and COVERAGE.md records exactly that
    trade-off. Write and read both parallelize per file split."""
    ev = tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type", "value"
    )
    base = work_dir("xmlround", sf_dir)
    path = os.path.join(base, "events_xml")
    ev.write.format("xml").option("rowTag", "event").mode("overwrite").save(path)
    back = spark.read.format("xml").option("rowTag", "event").load(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "q_try_arithmetic",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                         ELSE CAST(round(o_totalprice * 100) AS BIGINT) // (o_orderkey % 10)
                    END) AS BIGINT) AS sum_safe_div,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_zero,
           CAST(SUM(CASE WHEN o_orderkey > 9223372036854775807 / 900000000000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("sql-surface", "ansi", "try-functions", "round7"),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``try_*`` arithmetic semantics: with ANSI mode (the Spark 4
    default) a plain ``/`` by zero or a bigint overflow ABORTS the
    query; the try_ forms return NULL instead and aggregation skips
    them. Per priority: the sum of try_divide-guarded integer
    divisions (divisor = orderkey mod 10, zero for every 10th order),
    the count of NULLed-out zero divisions, and the count of rows
    whose try_multiply(orderkey, 9e14) overflows bigint — real overflows
    at sf>=0.01 where orderkey exceeds ~10248. The oracle spells out the identical semantics with CASE.

    Scale shape: pure map-side expression work + one bounded groupBy."""
    o = tables(spark, sf_dir)["orders"]
    div = F.expr(
        "try_divide(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey % 10)"
    )
    # integer-division semantics to match the oracle's //: floor of the
    # exact rational — but both inputs are nonnegative so DIV == floor
    safe_div = F.when(
        (F.col("o_orderkey") % 10) != 0,
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV (o_orderkey % 10)"),
    )
    overflow = F.expr("try_multiply(o_orderkey, 900000000000000L)").isNull()
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(safe_div).cast("bigint").alias("sum_safe_div"),
        F.sum(F.when(div.isNull(), 1).otherwise(0)).cast("bigint").alias("n_div_zero"),
        F.sum(F.when(overflow, 1).otherwise(0)).cast("bigint").alias("n_overflow"),
    )

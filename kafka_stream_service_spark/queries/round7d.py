"""Round-7 operator batch 4: the remaining Spark-4 SQL language
surfaces — pipe syntax, SQL scripting, dynamic SQL.

These close out the modern-SQL tier started in round 6 (recursive CTE,
LATERAL, VARIANT, collation) and round 7 batch 2 (GROUP BY ALL, SQL
UDFs, named parameters). DuckDB does not implement pipe syntax or
Spark's scripting block, so each oracle is the standard-SQL equivalent
— which is exactly the claim under test: the new surface must lower to
the same relational algebra, bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import tables
from .registry import query


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM lineitem
    WHERE l_quantity < 30
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
    tags=("sql-surface", "pipe", "round7"),
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operators, the GoogleSQL
    pipe-query form): scan |> filter |> aggregate |> post-agg filter,
    written top-down in dataflow order. The oracle is the classic
    SELECT/WHERE/GROUP BY/HAVING equivalent — the hash proves the pipe
    form lowers to the identical plan (filter pushdown and map-side
    combine included; each ``|>`` stage is sugar, not a materialization
    barrier)."""
    tables(spark, sf_dir)["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity < 30
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 100
        """
    )


@query(
    "q_sql_scripting",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(15 * (SELECT COUNT(*) FROM orders) AS BIGINT) AS folded_base
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("sql-surface", "scripting", "round7"),
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN ... END`` procedural blocks):
    DECLARE'd variables, a data-driven SET from a scalar subquery, and a
    WHILE loop folding acc = acc*2 + base four times (= 15 * base in
    closed form), with the loop result joined into a grouped query. The
    oracle states the closed form, so a mis-executed iteration count or
    a stale variable read flips the hash. Control flow runs ON THE
    DRIVER over scalar variables only — the data-scale work stays
    declarative inside the loop-free final SELECT, which is the correct
    division of labor for procedural SQL at 100 TB."""
    tables(spark, sf_dir)["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE base BIGINT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          SET base = (SELECT COUNT(*) FROM orders);
          WHILE i < 4 DO
            SET acc = acc * 2 + base;
            SET i = i + 1;
          END WHILE;
          SELECT o_orderstatus, COUNT(*) AS n_orders,
                 CAST(acc AS BIGINT) AS folded_base
          FROM orders GROUP BY o_orderstatus;
        END
        """
    )


@query(
    "q_execute_immediate",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql-surface", "dynamic-sql", "round7"),
)
def q_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL (Spark 4 ``EXECUTE IMMEDIATE ... USING``): a query
    template compiled at runtime with positional parameters bound as
    typed literals — the safe form of SQL-string assembly (the binding
    never string-splices, so a malicious value cannot change the parse
    tree). The oracle is the same query with the literal written out;
    pushdown of the bound predicate is inherited from the ordinary
    parameterized-SQL path."""
    tables(spark, sf_dir)["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT o_orderpriority, COUNT(*) AS n_orders "
        "FROM orders WHERE o_orderstatus = ? GROUP BY o_orderpriority' "
        "USING 'F'"
    )

"""Query registry: name -> (spark callable, optional DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) wants two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``
as equivalent ANSI SQL for DuckDB. Queries without SQL-expressible
semantics register ``oracle=None`` and get the driver's weaker rows-only
check.

Oracle-matching rules applied throughout the catalog (SURVEY.md §7):

- every computed column is aliased identically in Spark and SQL;
- double aggregations go through exact DECIMAL arithmetic wherever the
  data permits (all money columns in the fixtures are 2-decimal), so
  results are bit-identical regardless of summation order — this matters
  because Spark and DuckDB sum partitions in different orders;
- timestamps stay UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _pin_session_confs(spark: SparkSession) -> None:
    """Oracle-critical session confs, applied defensively on every query
    call: the driver's harness owns its SparkSession and may not set
    these. UTC pins every session-tz-sensitive expression
    (unix_timestamp/unix_micros on NTZ, LTZ<->NTZ casts in the events
    loader) to the values DuckDB computes; nanosAsLong lets the events
    parquet (TIMESTAMP_NANOS) load at all.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a catalog query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = QuerySpec(name, wrapped, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql_dict() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}

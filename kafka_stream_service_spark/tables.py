"""Fixture-table loaders.

``spark.read.parquet`` gives columnar scans with predicate pushdown and
column pruning for free; at 100 TB the same call reads a partitioned
directory tree and Catalyst prunes partitions from the filters in the plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads
        # via the nanosAsLong escape hatch; convert to microsecond
        # TIMESTAMP_NTZ (truncation — matching how DuckDB/Arrow read the
        # same file), keeping event-time semantics identical to the oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


class Tables:
    """Lazy dict-like access to the fixture tables of one scale factor."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def register_views(self, names: tuple[str, ...] = TABLE_NAMES) -> None:
        for n in names:
            self[n].createOrReplaceTempView(n)


def tables(spark: SparkSession, sf_dir: str | None = None) -> Tables:
    return Tables(spark, sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))

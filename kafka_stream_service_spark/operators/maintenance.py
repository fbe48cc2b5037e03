"""Table-maintenance operators: small-file compaction.

Streaming sinks and fine-grained partition writes accumulate small
parquet files (one per micro-batch per partition); at 100 TB the
resulting footer/open overhead dominates scan time long before data
volume does. Compaction rewrites a directory to ~target-sized files —
the routine maintenance job every production lakehouse schedules.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def directory_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    for any configured scheme (file://, hdfs://, s3a://), no driver-side
    os.walk assumption."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> DataFrame:
    """Rewrite ``src_path`` into ceil(total_bytes / target) files at
    ``dst_path`` and return the compacted frame.

    Uses coalesce (narrow — no shuffle) when reducing the partition
    count, falling back to a round-robin repartition only when the
    source has FEWER partitions than the target (splitting requires a
    shuffle). Row content is untouched: compaction must be invisible to
    every reader (asserted in tests/test_maintenance.py).

    In-place compaction (dst == src) is explicitly unsupported: the
    overwrite would read and clobber the same directory, and Spark's
    own "cannot overwrite a path being read from" check is
    source/version dependent and fires only after work is done. Use the
    standard write-to-temp-then-swap recipe instead.
    """
    import os

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError(
            f"in-place compaction is unsupported (src == dst == {src_path!r}); "
            "write to a temp dir and swap"
        )
    df = spark.read.parquet(src_path)
    total = directory_bytes(spark, src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    current = df.rdd.getNumPartitions()
    sized = df.coalesce(n_files) if current >= n_files else df.repartition(n_files)
    sized.write.mode("overwrite").option("compression", compression).parquet(dst_path)
    return spark.read.parquet(dst_path)

"""Table-maintenance operators: small-file compaction.

Streaming sinks and fine-grained partition writes accumulate small
parquet files (one per micro-batch per partition); at 100 TB the
resulting footer/open overhead dominates scan time long before data
volume does. Compaction rewrites a directory to ~target-sized files —
the routine maintenance job every production lakehouse schedules.

Two granularities:

- ``compact_parquet``: whole-directory rewrite to a NEW path.
- ``plan_compaction`` + ``compact_partitions``: partition-aware — walk a
  Hive-partitioned tree, build per-partition file-size histograms,
  select only the partitions whose file count exceeds their size-derived
  target, and rewrite each selected leaf via the write-to-staging-then-
  swap recipe. Untouched partitions keep their exact files, so a 100 TB
  table with one hot fragmented partition rewrites only that partition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

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


def directory_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, file_count) from the same one-RPC ContentSummary
    listing as directory_bytes — both fields come back together, so the
    file count is free wherever the byte total is already needed."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    summary = fs.getContentSummary(p)
    return summary.getLength(), summary.getFileCount()


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
    total, n_src_files = directory_stats(spark, src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    # Scan width from plan-time estimation, not df.rdd — the RDD probe
    # finalizes the plan (ranks.py's r13 lesson). The estimate follows
    # FilePartition's own packing arithmetic: each file pays
    # openCostInBytes of padding and splits/packs into maxPartitionBytes
    # bins, so width >= ceil((bytes + files * openCost) / maxBytes).
    # Bytes alone (the pre-r15 form, ADVICE r14) undercounts a
    # many-tiny-files source — the exact shape compaction exists for —
    # which flipped the decision to a full repartition shuffle where the
    # narrow coalesce suffices. The bin-packing bound means the estimate
    # never EXCEEDS the real width, so whenever it picks coalesce the
    # real width is >= n_files and the coalesce genuinely lands on
    # n_files output files rather than no-opping.
    from .ranks import _parse_bytes

    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    open_cost = _parse_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304b")
    )
    padded = total + n_src_files * open_cost
    current = max(1, -(-padded // max(max_bytes, 1)))
    sized = df.coalesce(n_files) if current >= n_files else df.repartition(n_files)
    sized.write.mode("overwrite").option("compression", compression).parquet(dst_path)
    return spark.read.parquet(dst_path)


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


@dataclass(frozen=True)
class PartitionPlan:
    """One leaf partition's file histogram + compaction decision."""

    path: str  # absolute leaf directory
    n_files: int
    total_bytes: int
    n_target_files: int  # ceil(total / target)

    @property
    def needs_compaction(self) -> bool:
        return self.n_files > self.n_target_files


def plan_compaction(
    spark: SparkSession, root: str, target_file_bytes: int = 128 * 1024 * 1024
) -> list[PartitionPlan]:
    """Walk a (possibly Hive-partitioned) parquet tree and build the
    per-leaf file-size histogram: every directory that directly contains
    data files is a leaf partition, its target file count is
    ceil(total_bytes / target), and it needs compaction iff it currently
    holds more files than that.

    Driver cost is one recursive listing (the same metadata a scan's
    file index reads) — no data is touched, so planning a 100 TB table
    is cheap and the subsequent rewrite touches ONLY flagged leaves.
    """
    fs, rootp, jvm = _fs(spark, root)
    plans: list[PartitionPlan] = []

    def walk(p) -> None:
        entries = fs.listStatus(p)
        files = [
            e
            for e in entries
            if e.isFile() and not e.getPath().getName().startswith(("_", "."))
        ]
        for e in entries:
            if e.isDirectory():
                walk(e.getPath())
        if files:
            total = sum(e.getLen() for e in files)
            plans.append(
                PartitionPlan(
                    path=files[0].getPath().getParent().toUri().getPath(),
                    n_files=len(files),
                    total_bytes=int(total),
                    n_target_files=max(1, math.ceil(total / target_file_bytes)),
                )
            )
    walk(rootp)
    return sorted(plans, key=lambda pl: pl.path)


def compact_partitions(
    spark: SparkSession,
    plans: list[PartitionPlan],
    compression: str = "zstd",
) -> list[PartitionPlan]:
    """Execute a ``plan_compaction`` plan: rewrite each flagged leaf to
    its target file count via write-to-staging-then-swap (the recipe
    ``compact_parquet``'s in-place guard points at), leaving unflagged
    leaves byte-identical.

    The swap is two FileSystem renames (atomic per rename on HDFS/local;
    object stores substitute their committer). Between them a concurrent
    reader of THIS leaf can observe a missing directory — partition-level
    compaction without snapshot isolation is inherently briefly
    non-atomic; a table format (Iceberg/Delta) is the production answer
    when readers race maintenance. Returns the executed subset.
    """
    done: list[PartitionPlan] = []
    for pl in plans:
        if not pl.needs_compaction:
            continue
        fs, leaf, jvm = _fs(spark, pl.path)
        staging = jvm.org.apache.hadoop.fs.Path(pl.path + ".__compact_staging__")
        trash = jvm.org.apache.hadoop.fs.Path(pl.path + ".__compact_old__")
        fs.delete(staging, True)
        fs.delete(trash, True)
        (
            spark.read.parquet(pl.path)
            .coalesce(pl.n_target_files)
            .write.option("compression", compression)
            .parquet(staging.toUri().getPath())
        )
        if not fs.rename(leaf, trash):
            raise OSError(f"compaction swap failed moving {pl.path} aside")
        if not fs.rename(staging, leaf):
            fs.rename(trash, leaf)  # roll back
            raise OSError(f"compaction swap failed publishing {pl.path}")
        fs.delete(trash, True)
        done.append(pl)
    return done

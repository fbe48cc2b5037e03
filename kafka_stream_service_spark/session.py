"""SparkSession factory.

Local mode is one JVM with N executor threads; on a real cluster the same
configs apply per-executor. Everything here is sized so the same logical
plans scale from the sf0.001 smoke tables to a 1000-executor 100 TB run:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast)
- shuffle partitions ~ cores locally; AQE coalesces, and on a cluster the
  initial number is raised via ``spark.sql.adaptive.coalescePartitions.
  initialPartitionNum`` rather than hand-tuning per query
- Arrow enabled for every Python<->JVM boundary (pandas UDFs, toPandas)
- session timezone pinned to UTC so results are oracle-comparable
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# AQE coalesce floor (see the minPartitionSize comment in get_spark).
# Exposed as module-level helpers so the per-query scoping machinery
# (queries/registry.py re-pins the session default on every query call;
# iterative graph queries re-pin 1m for their own execution) reads the
# SAME source of truth as the session builder.
AQE_MIN_PARTITION_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def aqe_min_partition_size() -> str:
    """The session-default AQE coalesce floor, env-overridable."""
    return os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "32k")


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return 8


def get_spark(
    app_name: str = "kafka_stream_service_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    The defaults favor the driver's local[N] environment; on a cluster pass
    ``master=None`` with an external master URL in spark-submit and the same
    session-level SQL configs hold.
    """
    cores = cpu_count()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescer is a BYTES heuristic: with the default 1 MB
        # minPartitionSize it folds any sub-MB shuffle into ONE task,
        # which serializes CPU-BOUND stages whose bytes are small — the
        # portable tier's md5 lanes (16-permutation minhash signatures,
        # permutation grids) lost 10-30x of the machine exactly there
        # (optimization r15, stage profile: q_pair_index_snapshot spent
        # 3.7 of 5.9 s in one task reading a 427 KB shuffle; interleaved
        # A/B with 32k: 6.8 -> 3.0-3.5 s, q_dedup_incremental_snapshot
        # 3.3-3.7 -> 2.3-2.5 s). The floor is NOT free: iterative
        # many-small-stage rows pay more tiny-task scheduling per
        # iteration, and the driver confirmed >10% regressions on the
        # graph tier (VERDICT r15: q_triangle_oriented 0.67x,
        # q_label_propagation 0.71x, q_decontaminate_ngram 0.76x) —
        # those queries re-pin a 1m floor for their own execution via
        # _util.pin_iterative_aqe_floor (optimization r16), while
        # registry._pin_session_confs restores this session default on
        # every other query call. The floor is inert at scale: it binds
        # only while total stage bytes / parallelism is under 32 KB — a
        # CPU-heavy-small-bytes pathology, not a throughput regime;
        # large stages keep their guide-sized partitions via
        # parallelismFirst + advisory size.
        .config(AQE_MIN_PARTITION_KEY, aqe_min_partition_size())
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-coalesce stages that read persisted frames: iterative
        # operators (connected components, Lloyd training) persist tiny
        # intermediate frames, and without this every iteration over a
        # cached plan runs full-width shuffle stages (the default false
        # only exists to keep cached-output partitioning reusable)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the default 100-entry codegen cache thrashes under a catalog of
        # 190+ distinct query shapes — every pass recompiled every stage.
        # Measured on a 29-query sweep at sf0.1: pass totals 48/50 s with
        # the default vs 34/27 s at 5000 entries (warm pass ~2x faster)
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # ... and headroom for the generated classes to stay JIT-compiled:
        # the JVM default 240 MB code cache is sized for far fewer
        # codegen units than a full catalog sweep compiles (flushed
        # methods re-run interpreted). Defensive, standard advice for
        # codegen-heavy Spark; host-level run variance (+/-30%) drowns
        # any attempt to measure it in isolation here.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
            ),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

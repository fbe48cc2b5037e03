"""Streaming observability: progress metrics vs ground truth on the
3-batch watermark-drop shape q_stream_watermark_drop oracles at the
RESULT level (this is the metrics-side twin; R17 metrics-tap depth).

Measured semantics pinned here (Spark 4.1, this container):

- A late row is dropped only when its window was already CLOSED AND
  EVICTED; a late row for a window the operator never held is accepted
  as a new group (verified in round 6 with a fresh/late 2-batch probe —
  emitted, dropped=0).
- ``numRowsDroppedByWatermark`` UNDERCOUNTS: of 248 stragglers, 215
  were counted at the state-store stage and 33 were removed by the
  unmetered pre-shuffle watermark filter. The exact-equality contract
  lives in the RESULT oracle (no closed window re-emits); the metric is
  a lower bound — asserted as such, with the state-level invariants
  (zero updates, zero duplicate emissions) carrying the exactness.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from datetime import timedelta

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries._util import work_dir
from kafka_stream_service_spark.tables import tables

SF = "/root/testdata/sf0.001"


def test_watermark_drop_metrics_account_for_stragglers(spark):
    ev = tables(spark, SF)["events"].select("event_id", "ts", "event_type")
    bounds = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()[0]
    week_cut = bounds.mn + timedelta(days=7)
    sentinel = ev.orderBy(F.col("ts").desc(), "event_id").limit(1)
    stragglers = ev.filter(F.col("ts") < F.lit(week_cut))
    n_late = stragglers.count()
    assert n_late > 0

    base = work_dir("wmmetrics", SF)
    flat = os.path.join(base, "flat")
    os.makedirs(flat)
    now = time.time()
    for i, chunk in enumerate([ev, sentinel, stragglers]):
        staged = os.path.join(base, f"s{i}")
        chunk.coalesce(1).write.parquet(staged)
        (part,) = glob.glob(os.path.join(staged, "*.parquet"))
        dst = os.path.join(flat, f"{i:02d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (now - 600 + i * 10, now - 600 + i * 10))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "wm_metrics_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()

    stats = {
        int(p["batchId"]): p["stateOperators"][0]
        for p in progress
        if p["stateOperators"]
    }
    # load + sentinel batches drop nothing
    assert int(stats[0]["numRowsDroppedByWatermark"]) == 0
    assert int(stats[1]["numRowsDroppedByWatermark"]) == 0
    # straggler batch: the metric is a (large) lower bound on the drops,
    # and CRUCIALLY no straggler reaches state (zero updates)
    dropped = int(stats[2]["numRowsDroppedByWatermark"])
    assert 0 < dropped <= n_late
    assert dropped >= n_late // 2
    assert int(stats[2]["numRowsUpdated"]) == 0
    # result-level exactness: every closed window emitted exactly once
    out = spark.table(name)
    dups = (
        out.groupBy("window", "event_type").count().filter(F.col("count") > 1)
    )
    assert dups.count() == 0

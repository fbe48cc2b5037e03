"""Stream-stream join with watermarks and a time-range condition
(SURVEY.md §2.2 "Stream-stream / stream-static join").

Purchases stream ⋈ clicks stream per user, click within 1 hour before the
purchase — the attribution-join shape. Both sides carry watermarks so
Spark bounds the join state (old rows evicted once the watermark passes
the range condition's horizon).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from kafka_stream_service_spark.sources import stream_file_source
from kafka_stream_service_spark.tables import tables


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    events = tables(spark, sf_dir)["events"].withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    # two timestamp-ordered chunks for deterministic replay
    chunks = tmp_path / "ss"
    chunks.mkdir()
    ordered = events.orderBy("ts")
    rows = ordered.collect()
    half = len(rows) // 2
    now = time.time()
    for i, part in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(part, events.schema).coalesce(1).write.parquet(
            str(tmp_path / f"p{i}")
        )
        src = glob.glob(str(tmp_path / f"p{i}" / "*.parquet"))[0]
        dst = str(chunks / f"{i:02d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (now - 30 + i * 10, now - 30 + i * 10))

    stream = stream_file_source(spark, str(chunks), events.schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "p_user")

    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }

    # batch truth
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    exp = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).collect()
    }
    assert exp, "fixture produced no attributable pairs"
    # every streamed pair is real and nothing within the watermark horizon
    # is lost: streamed set == batch set (all data replayed; horizon ample)
    assert got == exp

"""Streaming sink builders.

The Kafka sink mirrors the reference's producer (R10-R12,
StreamsApplication.java:107-115,194): topic ``replies``, null key, value =
wire-framed Message. Exactly-once lives in ``eos.py`` (foreachBatch);
the plain sink here is Spark's native at-least-once Kafka writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def write_kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str = "replies",
    checkpoint_dir: str = "/tmp/kssp-checkpoints/kafka-sink",
    degraded_ordering: bool = False,
) -> DataStreamWriter:
    """Kafka sink with the reference's output shape: null key
    (StreamsApplication.java:194), framed value.

    ``degraded_ordering=True`` reproduces R15 (post-failure
    maxInFlight(1) — strict ordering over throughput,
    StreamsApplication.java:138-140).
    """
    out = df
    if "key" not in df.columns:
        out = out.withColumn("key", F.lit(None).cast("binary"))
    writer = (
        out.select("key", "value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    if degraded_ordering:
        writer = writer.option("kafka.max.in.flight.requests.per.connection", "1")
    return writer


def write_memory_sink(df: DataFrame, query_name: str) -> DataStreamWriter:
    """In-memory table sink — deterministic test sink
    (`spark.sql(f"SELECT * FROM {query_name}")` reads it back)."""
    return df.writeStream.format("memory").queryName(query_name).outputMode("append")


def write_noop_sink(df: DataFrame) -> DataStreamWriter:
    """Computes everything, writes nothing — throughput measurement sink."""
    return df.writeStream.format("noop")

"""Pipeline parity tests (SURVEY.md §5 items 4-5): the reference's
decode -> uppercase -> encode demo behavior end-to-end, batch and
streaming, plus checkpoint restart and the fault path.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kafka_stream_service_spark.codec import decode_py, encode_py
from kafka_stream_service_spark.eos import ForeachBatchIdempotentWriter
from kafka_stream_service_spark.pipeline import (
    PipelineConfig,
    run_pipeline_batch,
    start_pipeline,
)
from kafka_stream_service_spark.transform import (
    FunctionConfig,
    RemoteFunction,
    identity_function,
    uppercase_function,
)

MESSAGES = [
    ({"Accept": ["*/*"], "Content-Type": ["text/plain"]}, b"World"),
    ({}, b"hello spark"),
    ({"x": ["1", "2"]}, b"MiXeD CaSe 123"),
]


def wire_frames_df(spark, messages=MESSAGES):
    rows = [(None, bytearray(encode_py(h, p))) for h, p in messages]
    return spark.createDataFrame(rows, "key binary, value binary")


def decode_outputs(rows):
    return [decode_py(bytes(r.value)) for r in rows]


def test_batch_pipeline_uppercase_parity(spark):
    """decode -> uppercase -> encode matches the reference demo: payload
    uppercased, headers preserved, key null (R6-R11)."""
    out = run_pipeline_batch(wire_frames_df(spark), uppercase_function).collect()
    assert all(r.key is None for r in out)
    decoded = decode_outputs(out)
    assert sorted(p for _, p in decoded) == sorted(
        p.decode().upper().encode() for _, p in MESSAGES
    )
    by_payload = {p: h for h, p in decoded}
    assert by_payload[b"WORLD"] == {"Accept": ["*/*"], "Content-Type": ["text/plain"]}


def test_dlq_pipeline_splits_poison_messages(spark):
    """A malformed frame (bad marker / truncated header section) must
    land in the dead-letter frame with the raw bytes and an error
    string, while every good record flows through transform->encode
    exactly as in the strict pipeline — one poison message must never
    kill the stream (the reference's strict deserializer + restart loop
    would crash-cycle forever on it)."""
    from kafka_stream_service_spark.pipeline import run_pipeline_with_dlq

    good_rows = [(None, bytearray(encode_py(h, p))) for h, p in MESSAGES]
    poison = [
        (None, bytearray(b"\x00not-a-frame")),  # missing 0xff marker
        (None, bytearray(b"\xff\x05trunc")),  # header count points past end
    ]
    frames = spark.createDataFrame(good_rows + poison, "key binary, value binary")
    out, dead = run_pipeline_with_dlq(frames, uppercase_function)
    assert sorted(p for _, p in decode_outputs(out.collect())) == sorted(
        p.decode().upper().encode() for _, p in MESSAGES
    )
    dead_rows = dead.collect()
    assert {bytes(r.value) for r in dead_rows} == {bytes(v) for _, v in poison}
    assert all(r.error for r in dead_rows)


def test_fused_pipeline_byte_parity_with_staged(spark):
    """The one-Arrow-pass fused pipeline (run_pipeline_fused) must be
    byte-identical to the staged decode->transform->encode composition,
    for both the uppercase transform and the identity bypass — it is an
    operator-fusion optimization, not a semantic variant."""
    from kafka_stream_service_spark.pipeline import run_pipeline_fused

    frames = wire_frames_df(spark)
    for fn, enabled in ((uppercase_function, True), (identity_function, True), (None, False)):
        staged = sorted(bytes(r.value) for r in run_pipeline_batch(frames, fn, enabled=enabled).collect())
        fused = sorted(bytes(r.value) for r in run_pipeline_fused(frames, fn, enabled=enabled).collect())
        assert fused == staged
    assert all(r.key is None for r in run_pipeline_fused(frames, uppercase_function).collect())


def test_identity_bypass(spark):
    """R9: enabled=False skips the transform stage entirely — output equals
    input bytes."""
    frames = wire_frames_df(spark)
    out = run_pipeline_batch(frames, uppercase_function, enabled=False).collect()
    in_values = sorted(bytes(r.value) for r in frames.collect())
    out_values = sorted(bytes(r.value) for r in out)
    assert out_values == in_values


def test_remote_function_local_fallback(spark):
    """The RemoteFunction client (gRPC slot) falls back to the local
    function when no channel is available, preserving behavior."""
    fn = RemoteFunction(FunctionConfig(host="localhost", port=1), uppercase_function)
    out = run_pipeline_batch(wire_frames_df(spark), fn).collect()
    payloads = sorted(p for _, p in decode_outputs(out))
    assert payloads == sorted(p.decode().upper().encode() for _, p in MESSAGES)


def test_streaming_pipeline_files_to_memory(spark, tmp_path):
    """The full streaming spine over a file source into a memory sink."""
    src = tmp_path / "in"
    wire_frames_df(spark).write.parquet(str(src))
    cfg = PipelineConfig(
        source="files",
        sink="memory",
        source_path=str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="pipe_mem_test",
    )
    q = start_pipeline(spark, cfg, uppercase_function)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM pipe_mem_test").collect()
    assert len(rows) == len(MESSAGES)
    payloads = sorted(p for _, p in decode_outputs(rows))
    assert payloads == sorted(p.decode().upper().encode() for _, p in MESSAGES)


def test_streaming_restart_no_dups_no_loss(spark, tmp_path):
    """R13/R14: stop the query, add more input, restart from checkpoint —
    every input appears exactly once across both runs (epoch-idempotent
    eos-files sink + checkpoint replay)."""
    src = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    wire_frames_df(spark, MESSAGES[:2]).write.parquet(str(src))

    cfg = PipelineConfig(
        source="files",
        sink="eos-files",
        source_path=str(src),
        output_dir=str(out_dir),
        checkpoint_dir=str(ckpt),
        query_name="pipe_restart_test",
    )
    q = start_pipeline(spark, cfg, uppercase_function)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # second wave lands while the query is down
    wire_frames_df(spark, MESSAGES[2:]).write.mode("append").parquet(str(src))
    q2 = start_pipeline(spark, cfg, uppercase_function)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    batch_dirs = glob.glob(os.path.join(str(out_dir), "batch_id=*"))
    assert batch_dirs, "no epoch outputs written"
    all_rows = spark.read.parquet(*batch_dirs).collect()
    payloads = sorted(p for _, p in decode_outputs(all_rows))
    assert payloads == sorted(p.decode().upper().encode() for _, p in MESSAGES)


def test_eos_writer_epoch_idempotent(spark, tmp_path):
    """A replayed epoch (same batchId) must not duplicate output — the
    foreachBatch exactly-once contract (R12)."""
    writer = ForeachBatchIdempotentWriter(str(tmp_path / "eos"))
    df = spark.range(5).select(F.col("id"))
    writer(df, 7)
    writer(df, 7)  # replay of the same epoch
    out = spark.read.parquet(str(tmp_path / "eos" / "batch_id=7")).collect()
    assert len(out) == 5
    assert writer.committed_epochs() == {7}


def test_fault_path_retry_after_planned_failure(spark, tmp_path):
    """The reference's planned-exception trick (commented fault injection
    at StreamsApplication.java:193): first attempt of a batch throws, the
    restart re-runs the same epoch from the checkpoint, output stays
    exactly-once."""
    src = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    wire_frames_df(spark).write.parquet(str(src))

    marker = tmp_path / "fail_once"
    marker.write_text("arm")

    def failing_once(batch):
        if marker.exists():
            marker.unlink()
            raise RuntimeError("Planned")  # the reference's fault message
        return uppercase_function(batch)

    cfg = PipelineConfig(
        source="files",
        sink="eos-files",
        source_path=str(src),
        output_dir=str(out_dir),
        checkpoint_dir=str(ckpt),
        query_name="pipe_fault_test",
    )
    q = start_pipeline(spark, cfg, failing_once)
    with pytest.raises(Exception):
        q.processAllAvailable()
        q.awaitTermination(10)
    q.stop()

    # supervised restart (R14): resume from checkpoint, same epoch re-runs
    q2 = start_pipeline(spark, cfg, failing_once)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    batch_dirs = glob.glob(os.path.join(str(out_dir), "batch_id=*"))
    all_rows = spark.read.parquet(*batch_dirs).collect()
    payloads = sorted(p for _, p in decode_outputs(all_rows))
    assert payloads == sorted(p.decode().upper().encode() for _, p in MESSAGES)

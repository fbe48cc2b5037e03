"""Structural invariants for round-7h: proto roundtrip, LSH recall
audit, QQ points."""

from __future__ import annotations

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_proto_roundtrip_matches_source(spark):
    """Decoded fields equal the source rows exactly and wire_len is
    consistent with a python re-encode."""
    from kafka_stream_service_spark.functions.proto_codec import encode_order
    from kafka_stream_service_spark.tables import tables
    from pyspark.sql import functions as F

    out = {r.order_id: r for r in QUERIES["q_proto_roundtrip"].spark_fn(spark, SF).collect()}
    src = (
        tables(spark, SF)["orders"]
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderpriority",
        )
        .collect()
    )
    assert len(out) == len(src) > 0
    for s in src:
        r = out[s.o_orderkey]
        assert (r.status, r.total_cents, r.priority) == (
            s.o_orderstatus,
            s.cents,
            s.o_orderpriority,
        )
        assert r.wire_len == len(
            encode_order(s.o_orderkey, s.o_orderstatus, s.cents, s.o_orderpriority)
        )


def test_lsh_recall_audit_confusion_algebra(spark):
    r = QUERIES["q_lsh_recall_audit"].spark_fn(spark, SF).collect()[0]
    assert r.tp + r.fn == r.n_truth
    assert r.tp + r.fp == r.n_candidates
    assert r.n_truth > 0  # planted near-dups exist in the block
    assert r.tp > 0
    assert 0 < r.recall_q <= 1_000_000
    assert 0 < r.precision_q <= 1_000_000


def test_qq_points_monotone_per_series(spark):
    out = sorted(QUERIES["q_qq_points"].spark_fn(spark, SF).collect(), key=lambda r: r.pct)
    assert [r.pct for r in out] == [10, 20, 30, 40, 50, 60, 70, 80, 90]
    for prev, cur in zip(out, out[1:]):
        assert prev.v_click <= cur.v_click
        assert prev.v_error <= cur.v_error

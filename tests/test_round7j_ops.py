"""Structural invariants for q_stateful_timeout_sessions_replay."""

from __future__ import annotations

import datetime

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
GAP = datetime.timedelta(minutes=123)


def test_sessions_are_gap_separated_and_well_formed(spark):
    """Per user: sessions are disjoint, ordered, separated by more than
    the gap (otherwise they would have merged), and internally
    start <= end with n_events >= 1."""
    out = QUERIES["q_stateful_timeout_sessions_replay"].spark_fn(spark, SF).collect()
    assert out
    by_user: dict[int, list] = {}
    for r in out:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_start)
        for prev, cur in zip(rows, rows[1:]):
            assert cur.session_start - prev.session_end > GAP


def test_open_final_sessions_are_withheld(spark):
    """Each emitted session's event count sums to total events minus
    the events of never-emitted (still-open) final sessions — and at
    least one such open session exists (the user active at stream end)."""
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_stateful_timeout_sessions_replay"].spark_fn(spark, SF).collect()
    emitted_events = sum(r.n_events for r in out)
    total = tables(spark, SF)["events"].count()
    assert 0 < emitted_events < total


def test_udtf_table_argument_first_last_respect_order(spark):
    """The PTF's first/last come from the partition's ORDER BY stream,
    so they must equal min/max doc_id per lang."""
    from pyspark.sql import functions as F
    from kafka_stream_service_spark.tables import tables

    out = {r.lang: r for r in QUERIES["q_udtf_table_argument"].spark_fn(spark, SF).collect()}
    want = {
        r["lang"]: r
        for r in tables(spark, SF)["documents"]
        .groupBy("lang")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(want)
    for lang, r in out.items():
        assert (r.first_doc, r.last_doc, r.n_docs) == (want[lang]["lo"], want[lang]["hi"], want[lang]["n"])

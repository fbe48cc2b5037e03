"""Edge cases for the corpus-restructuring queries (queries/chunking.py)
that the driver fixtures (10..99-token docs) never exercise: boundary
chunk counts, sub-bigram documents, and fully-duplicate segment docs.
"""

from __future__ import annotations

import hashlib

import pytest

from kafka_stream_service_spark.queries import QUERIES


def _docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_boundaries(spark, tmp_path):
    """Chunk count = 1 for n <= 40 tokens; a 41st token forces a second
    (overlapping) chunk; stride covers the tail without gaps."""
    t40 = " ".join(f"w{i}" for i in range(40))
    t41 = " ".join(f"w{i}" for i in range(41))
    t1 = "only"
    sf = _docs(
        spark,
        tmp_path,
        [(1, t40, "en", "s"), (2, t41, "en", "s"), (3, t1, "en", "s")],
    )
    rows = QUERIES["q_chunk_documents"].spark_fn(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 40
    assert len(by_doc[2]) == 2
    # second chunk starts at token 30, so it carries tokens 30..40 (11)
    c2 = {r.chunk_id: r.n_chunk_tokens for r in by_doc[2]}
    assert c2 == {0: 40, 1: 11}
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 1


def test_boilerplate_sub_bigram_docs_are_skipped(spark, tmp_path):
    """One-token docs produce no bigrams and must vanish from the output
    (not crash Spark's descending-sequence trap)."""
    sf = _docs(
        spark,
        tmp_path,
        [(1, "a b a b", "en", "s"), (2, "solo", "en", "s"), (3, "a b", "en", "s")],
    )
    rows = QUERIES["q_boilerplate_bigrams"].spark_fn(spark, sf).collect()
    assert {r.doc_id for r in rows} == {1, 3}
    # 'a b' occurs in 2/3 docs (>= 5%): every instance is boilerplate
    by = {r.doc_id: r for r in rows}
    assert by[3].n_bigrams == 1 and by[3].n_boiler == 1 and by[3].boiler_ratio == 1.0


def test_segment_dedup_fully_duplicate_doc(spark, tmp_path):
    """A document whose every 5-token segment already appeared in an
    earlier doc reconstructs to the EMPTY string (md5('') sentinel),
    with n_kept = 0."""
    seg = "t0 t1 t2 t3 t4"
    sf = _docs(
        spark,
        tmp_path,
        [(1, seg + " u0 u1 u2 u3 u4", "en", "s"), (2, seg, "en", "s")],
    )
    rows = {r.doc_id: r for r in QUERIES["q_segment_dedup_reconstruct"].spark_fn(spark, sf).collect()}
    assert rows[1].n_segments == 2 and rows[1].n_kept == 2
    assert rows[2].n_segments == 1 and rows[2].n_kept == 0 and rows[2].n_removed == 1
    assert rows[2].cleaned_md5 == hashlib.md5(b"").hexdigest()
    # doc 1 reconstructs to its own text (it owns the first occurrences)
    assert rows[1].cleaned_md5 == hashlib.md5((seg + " u0 u1 u2 u3 u4").encode()).hexdigest()


def test_rolling_anomaly_flags_planted_spike(spark, tmp_path):
    """A planted 100x spike after a stable run of 10 must be flagged;
    the stable values themselves must not (integer algebra sanity)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 7, "click", 10.0 + (i % 3) * 0.5, "{}")
        for i in range(10)
    ]
    rows.append((99, base + datetime.timedelta(minutes=99), 7, "click", 1000.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = QUERIES["q_rolling_anomaly"].spark_fn(spark, str(tmp_path)).collect()
    assert [r.event_id for r in got] == [99]
    assert got[0].n_window == 10

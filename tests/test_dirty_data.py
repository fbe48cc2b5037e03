"""Dirty-data robustness: the fixtures are clean (no nulls, ASCII only),
but a 100 TB corpus is not. Every text-facing operator must survive
null text, empty text, whitespace-only text, single tokens, and
multi-byte unicode without crashing — and treat them deterministically.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES

DIRTY_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 11, 2, 3, 4, 5],
        "text": [
            None,  # null text
            "",  # empty (doc_id 11 also passes the %11 frame-sample filter)
            " ",  # whitespace only
            "solo",  # single token
            "наука 科学 émoji 🚀 text",  # multi-byte unicode
            "the " * 200,  # long, zero-diversity
        ],
        "lang": ["en", "en", None, "de", "zh", "en"],
        "source": ["s0", "s0", "s1", "s1", None, "s2"],
        "n_chars": [0, 0, 1, 4, 20, 800],
    }
)

# text-facing catalog queries that read only the documents table
TEXT_QUERIES = [
    "q_text_quality_score",
    "q_text_token_stats",
    "q_text_langid",
    "q_text_fingerprint",
    "q_dedup_exact_hash",
    "q_pack_sequences",
    "q_hash_sample",
    "q_stratified_sample",
    "q_text_redact_pii",
    "q_multimodal_frame_sample",
    "q_text_wordcount",
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dirty")
    spark.createDataFrame(DIRTY_DOCS).write.mode("overwrite").parquet(
        str(base / "documents.parquet")
    )
    return str(base)


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_query_survives_dirty_docs(spark, dirty_dir, name):
    """No text-facing operator may crash on null/empty/unicode text; the
    result must also be collectable (no deferred executor error)."""
    df = QUERIES[name].spark_fn(spark, dirty_dir)
    rows = df.collect()
    assert isinstance(rows, list)


def test_shingles_and_minhash_on_dirty_text(spark, dirty_dir):
    """The MinHash signature path (shingle → hash → min per permutation)
    must produce a fixed-width signature for every non-null doc and not
    crash on nulls."""
    from kafka_stream_service_spark.operators.dedup import (
        hashed_word_shingles,
        minhash_signature,
    )

    docs = spark.read.parquet(dirty_dir + "/documents.parquet")
    sig = docs.select(
        "doc_id",
        minhash_signature(hashed_word_shingles(F.col("text"), n=3), k=16).alias("sig"),
    )
    rows = sig.collect()
    assert len(rows) == len(DIRTY_DOCS)
    for r in rows:
        if r.sig is not None:
            assert len(r.sig) == 16


def test_arrow_shingle_frame_on_dirty_text(spark, dirty_dir):
    """The Arrow-batched shingle path (the one the LSH pipeline actually
    uses) must map null/empty text to an empty shingle set, not crash the
    Python worker."""
    from kafka_stream_service_spark.operators.dedup import shingle_frame

    docs = spark.read.parquet(dirty_dir + "/documents.parquet")
    rows = {r.doc_id: r.shingles for r in shingle_frame(docs).collect()}
    assert rows[0] == []  # null text
    assert rows[11] == []  # empty text
    assert len(rows[5]) >= 1  # repeated text still shingles


def test_packing_manifest_covers_every_nonnull_token(spark, dirty_dir):
    """Sequence packing must account for every token of every doc exactly
    once (sum of chunk overlaps == doc token count), including the
    1-token splits of empty/whitespace text."""
    rows = QUERIES["q_pack_sequences"].spark_fn(spark, dirty_dir).collect()
    docs = {r.doc_id: r for r in spark.read.parquet(dirty_dir + "/documents.parquet").collect()}
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.tokens_in_chunk
    for doc_id, total in per_doc.items():
        text = docs[doc_id].text
        assert total == len(text.split(" ")), f"doc {doc_id} lost tokens"
    # null text contributes no manifest rows
    assert 0 not in per_doc


def test_similarity_ops_on_null_embeddings(spark, tmp_path):
    """A null embedding row must not crash the blocked-pairs matmul (numpy
    would build a ragged object array) nor the brute-force kNN fold —
    null vectors are excluded from scoring."""
    import numpy as np

    from kafka_stream_service_spark.operators.similarity import (
        blocked_cosine_pairs,
        knn_bruteforce,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)], 0) for i in range(6)]
    rows.append((6, None, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    pairs = blocked_cosine_pairs(emb, block_col="label", threshold=-1.0).collect()
    ids_in_pairs = {r.vec_a for r in pairs} | {r.vec_b for r in pairs}
    assert 6 not in ids_in_pairs
    assert len(pairs) == 15  # C(6,2) scored pairs survive

    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    knn = knn_bruteforce(emb, q, k=3).collect()
    assert all(r.neighbor_id != 6 for r in knn)
    assert {r.query_id for r in knn} == {0, 1}


def test_event_ops_on_dirty_events(spark, tmp_path):
    """Event-time operators must tolerate null timestamps / null users /
    null values: null-ts rows form their own (null-window) group in batch
    form rather than crashing, and the as-of join skips null keys."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=90), 7, "purchase", None, "{}"),
        (3, None, 7, "click", 2.0, "{}"),  # null event time
        (4, base + dt.timedelta(hours=3), None, "view", 3.0, None),  # null user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "events.parquet"
    ev.write.mode("overwrite").parquet(str(d))

    win = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # engine contract: the TimeWindow expansion FILTERS null event times —
    # the null-ts row silently leaves the aggregation (no null-window
    # group, no crash). Anyone needing those rows must route them first.
    assert sum(r.n for r in win) == 3
    assert all(r.window is not None for r in win)

    sess = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r.n for r in sess) == 3

"""Materialized pair-index snapshot (VERDICT r9 #1): build/read contract.

The oracle gate already hash-certifies q_pair_index_snapshot's
build->persist->read cycle and every consumer's results at sf0.01; these
tests pin the artifact-lifecycle properties the aggregate oracles cannot
state: snapshot == live derivation row-for-row, self-healing reads, and
revision-token isolation.
"""

from __future__ import annotations

import os
import shutil

from kafka_stream_service_spark.queries.dedup2 import (
    PAIR_INDEX_REV,
    _verified_pairs,
    build_pair_index,
    pair_index,
    pair_index_path,
)

SF = "/root/testdata/sf0.001"


def _wipe(sf_dir: str) -> None:
    shutil.rmtree(os.path.dirname(pair_index_path(sf_dir)), ignore_errors=True)


def _key_set(df):
    return {(r.id_a, r.id_b, r.n_inter, r.n_union) for r in df.collect()}


def test_snapshot_equals_live_derivation(spark):
    _, live = _verified_pairs(spark, SF)
    snap = build_pair_index(spark, SF)
    assert _key_set(snap) == _key_set(live)
    assert len(_key_set(snap)) > 0, "fixture must plant near-dup pairs"


def test_reader_self_heals_when_snapshot_absent(spark):
    _wipe(SF)
    assert not os.path.exists(pair_index_path(SF))
    got = pair_index(spark, SF)
    # the read built and persisted the artifact as a side effect
    assert os.path.exists(os.path.join(pair_index_path(SF), "_SUCCESS"))
    _, live = _verified_pairs(spark, SF)
    assert _key_set(got) == _key_set(live)


def test_reader_prefers_existing_snapshot(spark):
    build_pair_index(spark, SF)
    path = pair_index_path(SF)
    before = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}
    pair_index(spark, SF).count()
    after = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}
    assert before == after, "a fresh read must not rewrite the artifact"


def test_revision_token_is_in_the_path():
    # bumping PAIR_INDEX_REV must change the artifact location, so stale
    # snapshots from older derivation code can never be read
    assert PAIR_INDEX_REV in pair_index_path(SF)


def test_corpus_fingerprint_is_in_the_path():
    # regenerating the fixture under the same sf_dir must change the
    # artifact location (ADVICE r10): the subpath carries a fingerprint
    # of documents.parquet (mtime+size), distinct per corpus
    from kafka_stream_service_spark.queries.dedup2 import _documents_fingerprint

    fp = _documents_fingerprint(SF)
    assert fp in pair_index_path(SF)
    assert fp != _documents_fingerprint("/root/testdata/sf0.01")


def test_expression_signature_equals_typed_signature(spark):
    """portable_minhash_signature (the per-row expression form the
    streaming probe signs with) must be bit-identical to
    typed_minhash_signatures (the batch type-dictionary form every
    oracle certifies). Pins the r11 lambda-arity regression: a
    `lambda s, i=i` default-arg binding reads as two-arg to transform(),
    which silently swaps the seed for the array position."""
    from pyspark.sql import functions as F

    from kafka_stream_service_spark.operators.dedup import word_shingles_from_tokens
    from kafka_stream_service_spark.queries.dedup2 import (
        K,
        SHINGLE_N,
        portable_minhash_signature,
        typed_minhash_signatures,
    )
    from kafka_stream_service_spark.tables import tables

    d = tables(spark, SF)["documents"].select("doc_id", "text").limit(50)
    sh = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select(
        "doc_id", word_shingles_from_tokens(F.col("toks"), SHINGLE_N).alias("shingles")
    )
    expr_sigs = {
        r.doc_id: tuple(r.sig)
        for r in sh.select(
            "doc_id", portable_minhash_signature(F.col("shingles"), K).alias("sig")
        ).collect()
    }
    typed_sigs = {
        r.doc_id: tuple(r.sig) for r in typed_minhash_signatures(sh, K).collect()
    }
    assert expr_sigs == typed_sigs


def test_build_publishes_atomically(spark):
    # the build writes to a temp sibling and renames the COMPLETE dir
    # into place — after it returns, the final path holds _SUCCESS and
    # no temp sibling remains (readers can never see a partial rewrite)
    build_pair_index(spark, SF)
    path = pair_index_path(SF)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    parent = os.path.dirname(path)
    leftovers = [n for n in os.listdir(parent) if ".tmp." in n]
    assert not leftovers, f"temp publication dirs left behind: {leftovers}"

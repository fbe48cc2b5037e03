"""Multimodal plumbing, part 2: frame sampling (video) and resize (image).

Extends queries/multimodal.py's decode/feature-extract stubs with the two
remaining media ops a training-data pipeline needs. As there (and as with
the reference's opaque payload, MessageDeserializer.java:68), media bytes
are opaque binaries; the *decode* math is stubbed deterministically while
every Spark-side concern — 1→N row explosion, Arrow batch shape, binary
output columns, partitioning — is real.

Frame sampling is expressed with pure JVM expressions (sequence + explode
over payload slices), so it IS oracle-checkable; resize is an Arrow-batched
binary→binary mapInPandas with a deterministic stride-downsample stub
(rows-only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

FRAME_SIZE = 32  # bytes per pseudo-frame
FRAME_STRIDE = 4  # sample every 4th frame


@query(
    "q_multimodal_frame_sample",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_SIZE}.0) AS BIGINT),
                    {FRAME_STRIDE})) AS frame_idx,
             text
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(octet_length(encode(substring(text, CAST(frame_idx*{FRAME_SIZE}+1 AS INT), {FRAME_SIZE}))) AS INT) AS frame_len,
           sha256(substring(text, CAST(frame_idx*{FRAME_SIZE}+1 AS INT), {FRAME_SIZE})) AS frame_sha
    FROM fr
    """,
    tags=("multimodal", "frame-sample", "llm-data"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: split each payload into fixed-size
    frames, keep every FRAME_STRIDE-th, one output row per sampled frame
    (1→N via sequence+explode — all JVM-side, no Python).

    The fixtures carry no real video, so a "frame" is a deterministic
    FRAME_SIZE-byte slice of the payload; a real deployment swaps the
    slice expression for a container-format keyframe index, and the
    explode/shuffle story is unchanged. ASCII fixture text makes
    char-slices byte-identical to blob slices (asserted by frame_len).
    """
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 11 == 0)
    n_frames = F.ceil(F.length(F.encode(F.col("text"), "utf-8")) / F.lit(float(FRAME_SIZE)))
    # Empty payloads would make sequence(0, -1, stride) raise "Illegal
    # sequence boundaries"; CaseWhen evaluates lazily, so empty docs get an
    # empty frame list (explode then emits no rows — same as the oracle's
    # range(0, 0, stride)).
    idx = F.when(
        n_frames > 0,
        F.sequence(F.lit(0).cast("bigint"), n_frames - 1, F.lit(FRAME_STRIDE).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    frame = F.substring(
        F.col("text"), (F.col("frame_idx") * FRAME_SIZE + 1).cast("int"), FRAME_SIZE
    )
    return (
        d.select("doc_id", "text", F.explode(idx).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.length(F.encode(frame, "utf-8")).cast("int").alias("frame_len"),
            F.sha2(F.encode(frame, "utf-8"), 256).alias("frame_sha"),
        )
    )


def resize_stub(payload: bytes, factor: int) -> bytes:
    """STUB for image resize (no PIL/opencv in-container): deterministic
    stride downsample — every ``factor``-th byte. Swapping in a real
    ``PIL.Image.resize`` changes only this function; the Arrow batch
    plumbing, binary schema, and metadata recomputation stay as-is."""
    return payload[::factor]


@query(
    "q_multimodal_resize_stub",
    oracle=None,  # stubbed media math — driver rows-only check
    tags=("multimodal", "resize", "mapInPandas", "llm-data"),
)
def q_multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize operator shape: binary in → smaller binary out +
    updated metadata, via Arrow-batched mapInPandas.

    Binary→binary transforms are the one multimodal op that *must* round
    bytes through Python (Spark has no pixel ops); batches amortize codec
    setup, and the output stays columnar for downstream JVM ops — the
    digest/length checks here run on the JVM over the returned binaries.
    """
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 11 == 0)
    binary_df = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_stub(bytes(p), 4) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "resized": resized})

    out = binary_df.mapInPandas(resize_batches, schema="doc_id long, resized binary")
    return out.select(
        "doc_id",
        F.length("resized").cast("int").alias("n_bytes"),
        F.sha2(F.col("resized"), 256).alias("resized_sha"),
    ).orderBy("doc_id")


@query(
    "q_training_corpus_pipeline",
    oracle="""
    WITH quality AS (
      SELECT doc_id, source, text, string_split(text, ' ') AS toks
      FROM documents
      WHERE lang IN ('en', 'de')
    ), kept AS (
      SELECT doc_id, source, text, len(toks) AS n_tokens
      FROM quality
      WHERE len(toks) BETWEEN 50 AND 1000
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.05
    ), deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_tokens) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_tokens,
           MIN(doc_id) AS min_doc_id
    FROM deduped
    GROUP BY source
    """,
    tags=("pipeline", "dedup", "quality", "llm-data"),
)
def q_training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus prep in one plan: language filter →
    quality gate (length + diversity) → exact dedup (keep lowest doc_id
    per content hash) → per-source corpus stats.

    The composition is the point: filters stay pushed into the scan,
    the dedup window and final groupBy are the only two shuffles, and
    every stage is the catalog operator it reuses (q_text_quality_score,
    q_dedup_keep_first, q_lang_source_profile).
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    kept = (
        d.filter(F.col("lang").isin("en", "de"))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("diversity", F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        .filter(F.col("n_tokens").between(50, 1000) & (F.col("diversity") > 0.05))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.count(F.lit(1)).cast("double"), 4).alias("avg_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )

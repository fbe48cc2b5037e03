"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.2 LLM-data ops; the reference's payload is likewise opaque
bytes — MessageDeserializer.java:68).

The image/audio decode libraries are not in this container, so the decode
step is STUBBED behind ``decode_stub`` (deterministic fake features derived
from the bytes); everything Spark-side — binary schema, metadata struct,
mapInPandas batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha,
           substr(text, 1, 8) AS magic_prefix,
           'application/octet-stream' AS mime
    FROM documents WHERE doc_id % 7 = 0
    """,
    tags=("multimodal", "llm-data"),
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata extraction, all JVM-side: byte
    length, content digest, magic-byte prefix, mime tag."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 7 == 0)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
        F.decode(F.substring(payload, 1, 8), "utf-8").alias("magic_prefix"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB for the media decode step (no image/audio libs in-container).

    Deterministic fake: derives pseudo width/height/channels and a 4-dim
    feature vector from the content digest, so the distributed plumbing is
    fully exercisable and the output reproducible. A real deployment swaps
    this single function for PIL/ffmpeg/etc.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    features = [round(b / 255.0, 6) for b in digest[3:7]]
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "features": features,
    }


_DECODE_OUT_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, features array<double>"
)


@query(
    "q_multimodal_decode_stub",
    oracle=None,  # stubbed media decode — driver rows-only check
    tags=("multimodal", "mapInPandas", "llm-data"),
)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media decode/feature-extract operator: binary column in,
    metadata + feature vector out, via mapInPandas (Arrow batches).

    The batch shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is
    exactly what a real GPU/codec stage needs: per-batch amortized setup,
    per-partition sequential streaming, no driver involvement.
    """
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 7 == 0)
    binary_df = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "features": [m["features"] for m in metas],
                }
            )

    decoded = binary_df.mapInPandas(decode_batches, schema=_DECODE_OUT_SCHEMA)
    # Surface the feature vector as a '|'-joined string so every output
    # column is atomic (driver-hashable); the Arrow plumbing above still
    # carries the real array<double>.
    return decoded.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "channels",
        F.array_join(F.transform("features", lambda x: F.format_number(x, 6)), "|").alias(
            "features"
        ),
    ).orderBy("doc_id")

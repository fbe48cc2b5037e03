"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.2 LLM-data ops; the reference's payload is likewise opaque
bytes — MessageDeserializer.java:68).

The decode step is REAL as of round 5: a pure-stdlib PNG codec
(``operators/imagecodec.py`` — chunk walk with CRC verification, zlib
inflate, full five-filter scanline unfiltering). Image fixtures are
synthesized deterministically from the document text bytes, so DuckDB can
recompute the decoded pixel values with pure integer SQL and the driver
hash-checks the decoder end-to-end (a wrong Paeth predictor or a dropped
IDAT byte changes ``pixel_sum``/``pixel_wsum`` and fails the gate).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.imagecodec import decode_png, encode_png, synth_pixels
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


def png_images_df(spark: SparkSession, sf_dir: str, modulus: int) -> DataFrame:
    """Shared fixture stage: synthesize a real PNG per document.

    Pixel content is a pure integer function of (doc_id, text bytes) —
    see ``synth_pixels`` — and the encoder cycles the scanline filter
    through all five PNG filter types per (row + doc_id), splitting the
    stream into 512-byte IDAT chunks, so the downstream decoder must get
    Sub/Up/Average/Paeth *and* multi-IDAT concatenation exactly right to
    reproduce the oracle's pixel math.
    """
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % modulus == 0)
    binary_df = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    # The per-image Python cost is the whole wall-clock here, and the
    # fixture corpus arrives as ONE parquet file -> one task serializing
    # every decode. Fan the codec work across the cluster when the scan
    # is narrower than the available slots; at real scale the source
    # already has thousands of partitions and this is a no-op.
    # (cpu_fanout decides from plan-time Catalyst stats — the old
    # .rdd.getNumPartitions() probe finalized the plan, r13's ranks
    # lesson applied here in r14.)
    from ..operators.ranks import cpu_fanout

    binary_df = cpu_fanout(binary_df)

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pngs = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                did = int(did)
                px = synth_pixels(bytes(p), did)
                pngs.append(
                    encode_png(
                        px,
                        filter_for_row=lambda y, d=did: (y + d) % 5,
                        idat_chunk_size=512,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "png": pngs})

    return binary_df.mapInPandas(encode_batches, schema="doc_id long, png binary")


# Shared CTE: the oracle-side definition of the synthesized image — must
# mirror operators/imagecodec.py:synth_pixels exactly. ``j`` enumerates
# row-major channel-interleaved pixel bytes; pixel value = text byte at
# j % len(text) (fixtures are pure ASCII, so ascii(char) == byte).
_PIXEL_CTE = """
    WITH params AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             16 + doc_id % 17 AS w, 12 + doc_id % 13 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % {modulus} = 0
    ), px AS (
      SELECT doc_id, w, h, c,
             unnest(range(0, w*h*c)) AS j,
             ascii(substring(text, CAST(j % n AS INT) + 1, 1)) AS v
      FROM params
    )
"""


@query(
    "q_multimodal_decode",
    oracle=_PIXEL_CTE.format(modulus=7)
    + """
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(c AS INT) AS channels,
           CAST(w*h*c AS BIGINT) AS n_pixel_bytes,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           CAST(SUM((j % 251 + 1) * v) AS BIGINT) AS pixel_wsum
    FROM px
    GROUP BY doc_id, w, h, c
    """,
    tags=("multimodal", "mapInPandas", "llm-data", "imagecodec"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode: binary PNG column in → dimensions + exact pixel
    statistics out, via Arrow-batched mapInPandas over a pure-stdlib PNG
    decoder (CRC-verified chunk walk, zlib inflate, 5-filter scanline
    unfiltering — operators/imagecodec.py).

    The oracle recomputes the same pixel bytes with integer SQL (the
    fixture synthesis is SQL-expressible by construction), so the driver's
    hash gate verifies the decoder bit-for-bit: width/height/channels from
    IHDR, and two pixel checksums (plain sum + position-weighted sum) over
    the unfiltered scanlines.

    Batch shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is what
    a real GPU/codec stage needs: per-batch amortized setup, per-partition
    sequential streaming, no driver involvement; per-image Python cost is
    embarrassingly parallel across executors at 100 TB.
    """
    images = png_images_df(spark, sf_dir, modulus=7)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "n_pixel_bytes",
                    "pixel_sum",
                    "pixel_wsum",
                )
            }
            for did, png in zip(pdf["doc_id"], pdf["png"]):
                px = decode_png(bytes(png))
                h, w = px.shape[:2]
                c = 1 if px.ndim == 2 else px.shape[2]
                flat = px.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["n_pixel_bytes"].append(flat.size)
                out["pixel_sum"].append(int(flat.sum()))
                out["pixel_wsum"].append(int(((j % 251 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    # no final orderBy: the driver's value hash is order-insensitive, and
    # a global sort would add a shuffle for presentation only
    return images.mapInPandas(
        decode_batches,
        schema=(
            "doc_id long, width int, height int, channels int, "
            "n_pixel_bytes long, pixel_sum long, pixel_wsum long"
        ),
    )


CROP = 8  # center-crop side (fixture minima: w >= 16, h >= 12)


@query(
    "q_image_augment",
    oracle=_PIXEL_CTE.format(modulus=7).replace(", px AS", ", px_unused AS")
    + f""",
    aug AS (
      SELECT doc_id, w, h, c, n, text,
             unnest(range(0, {CROP} * {CROP} * c)) AS j
      FROM params
    ),
    mapped AS (
      SELECT doc_id, w, h, c, j,
             -- augmented (y, x, ch) -> source byte index under
             -- horizontal flip then center crop
             ((((h - {CROP}) // 2) + j // ({CROP} * c)) * w
              + (w - 1 - ((w - {CROP}) // 2 + (j % ({CROP} * c)) // c))) * c
             + (j % c) AS j_src,
             text, n
      FROM aug
    ),
    vals AS (
      SELECT doc_id, w, h, c, j,
             ascii(substring(text, CAST(j_src % n AS INT) + 1, 1)) AS v
      FROM mapped
    )
    SELECT doc_id,
           CAST({CROP} AS INT) AS crop_w, CAST({CROP} AS INT) AS crop_h,
           CAST(c AS INT) AS channels,
           CAST(SUM(v) AS BIGINT) AS aug_sum,
           CAST(SUM((j % 251 + 1) * v) AS BIGINT) AS aug_wsum
    FROM vals
    GROUP BY doc_id, c
    """,
    tags=("multimodal", "augmentation", "llm-data", "imagecodec"),
)
def q_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image augmentation (the training-data transform): decode the
    PNG, HORIZONTAL-FLIP, CENTER-CROP to 8x8, and emit exact integer
    checksums of the augmented pixels. The oracle recomputes every
    augmented byte analytically (flip/crop become index arithmetic over
    the synthesis formula), so a wrong flip axis, an off-by-one crop
    offset, or a channel-order slip each flips the driver hash.

    Same Arrow batch shape as the decode stage; augmentation cost is
    embarrassingly parallel. At 100 TB this is the map-side stage
    feeding an image-training shard writer."""
    images = png_images_df(spark, sf_dir, modulus=7)

    def augment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: []
                for k in ("doc_id", "crop_w", "crop_h", "channels", "aug_sum", "aug_wsum")
            }
            for did, png in zip(pdf["doc_id"], pdf["png"]):
                px = decode_png(bytes(png))
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, c = px.shape
                flipped = px[:, ::-1, :]
                top = (h - CROP) // 2
                left = (w - CROP) // 2
                crop = flipped[top : top + CROP, left : left + CROP, :]
                flat = crop.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(int(did))
                out["crop_w"].append(CROP)
                out["crop_h"].append(CROP)
                out["channels"].append(c)
                out["aug_sum"].append(int(flat.sum()))
                out["aug_wsum"].append(int(((j % 251 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return images.mapInPandas(
        augment_batches,
        schema="doc_id long, crop_w int, crop_h int, channels int, aug_sum bigint, aug_wsum bigint",
    )

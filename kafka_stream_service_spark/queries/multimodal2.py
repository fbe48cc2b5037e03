"""Multimodal plumbing, part 2: frame sampling (video) and resize (image).

Extends queries/multimodal.py's real PNG decode with the two remaining
media ops a training-data pipeline needs. As there (and as with the
reference's opaque payload, MessageDeserializer.java:68), media bytes are
opaque binaries.

Frame sampling is expressed with pure JVM expressions (sequence + explode
over payload slices), so it IS oracle-checkable; resize (round 5) is the
REAL pipeline: PNG decode → true integer box-filter downsample →
pixel-exact statistics, hash-checked against a pure-SQL oracle that
recomputes the block means arithmetically.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.imagecodec import box_resize, decode_png
from ..tables import tables
from .multimodal import png_images_df
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


RESIZE_FACTOR = 4  # box-filter downsample factor (complete blocks only)


@query(
    "q_multimodal_resize",
    oracle=f"""
    WITH params AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             16 + doc_id % 17 AS w, 12 + doc_id % 13 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 11 = 0
    ), px AS (
      SELECT doc_id, w, h, c,
             unnest(range(0, w*h*c)) AS j,
             ascii(substring(text, CAST(j % n AS INT) + 1, 1)) AS v
      FROM params
    ), coords AS (
      SELECT doc_id, w, h, c,
             (j // c) // w AS r, (j // c) % w AS col, j % c AS ch, v
      FROM px
    ), blocks AS (
      SELECT doc_id, c, w // {RESIZE_FACTOR} AS ow, h // {RESIZE_FACTOR} AS oh,
             r // {RESIZE_FACTOR} AS br, col // {RESIZE_FACTOR} AS bc, ch,
             SUM(v) AS block_sum
      FROM coords
      WHERE r < (h // {RESIZE_FACTOR}) * {RESIZE_FACTOR}
        AND col < (w // {RESIZE_FACTOR}) * {RESIZE_FACTOR}
      GROUP BY doc_id, c, w, h, r // {RESIZE_FACTOR}, col // {RESIZE_FACTOR}, ch
    ), outs AS (
      SELECT doc_id, c, ow, oh,
             (br * ow + bc) * c + ch AS m,
             block_sum // {RESIZE_FACTOR * RESIZE_FACTOR} AS v
      FROM blocks
    )
    SELECT doc_id,
           CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
           CAST(c AS INT) AS channels,
           CAST(SUM(v) AS BIGINT) AS resized_sum,
           CAST(SUM((m % 251 + 1) * v) AS BIGINT) AS resized_wsum
    FROM outs
    GROUP BY doc_id, ow, oh, c
    """,
    tags=("multimodal", "resize", "mapInPandas", "llm-data", "imagecodec"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: PNG decode (operators/imagecodec.py) → true
    box-filter downsample by {RESIZE_FACTOR} (floor-mean over complete
    k×k blocks) → exact integer statistics of the resized pixels.

    The oracle recomputes every output pixel arithmetically (group text
    bytes into k×k blocks, integer-divide the block sum), so the driver
    hash gate verifies decoder + resampler end-to-end. Binary→binary
    pixel transforms are the one multimodal op that must round bytes
    through Python (Spark has no pixel ops); Arrow batches amortize
    setup and the work is embarrassingly parallel across executors.
    """
    images = png_images_df(spark, sf_dir, modulus=11)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id",
                    "out_width",
                    "out_height",
                    "channels",
                    "resized_sum",
                    "resized_wsum",
                )
            }
            for did, png in zip(pdf["doc_id"], pdf["png"]):
                px = decode_png(bytes(png))
                small = box_resize(px, RESIZE_FACTOR)
                oh, ow = small.shape[:2]
                c = 1 if small.ndim == 2 else small.shape[2]
                flat = small.reshape(-1).astype(np.int64)
                m = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(int(did))
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["channels"].append(c)
                out["resized_sum"].append(int(flat.sum()))
                out["resized_wsum"].append(int(((m % 251 + 1) * flat).sum()))
            yield pd.DataFrame(out)

    # no final orderBy: the driver's value hash is order-insensitive, and
    # a global sort would add a shuffle for presentation only
    return images.mapInPandas(
        resize_batches,
        schema=(
            "doc_id long, out_width int, out_height int, channels int, "
            "resized_sum long, resized_wsum long"
        ),
    )


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


@query(
    "q_binaryfile_ingest",
    oracle="""
    WITH params AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             16 + doc_id % 17 AS w, 12 + doc_id % 13 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c
      FROM documents WHERE doc_id % 9 = 0
    ), px AS (
      SELECT doc_id, w, h, c,
             unnest(range(0, w*h*c)) AS j,
             ascii(substring(text, CAST(j % n AS INT) + 1, 1)) AS v
      FROM params
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           TRUE AS n_bytes_match
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "storage", "binaryfile", "llm-data"),
)
def q_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard multimodal INGEST path: media as FILES on disk, read
    with Spark's native binaryFile source — (path, modificationTime,
    length, content) rows — then identity recovered from the path
    (regexp) and pixels decoded from the content column. This is how a
    raw image/audio drop enters the engine before it ever becomes a
    parquet binary column; q_multimodal_decode takes over from there.

    Staging is executor-side (foreachPartition writes each partition's
    PNGs — no driver loop, the shape of a distributed media exporter);
    n_bytes_match pins the binaryFile source's length metadata against
    octet_length(content). The oracle recomputes widths/heights/pixel
    sums from the synthesis arithmetic — a torn file, a bad path parse,
    or a short read flips the hash.

    Scale: binaryFile parallelizes by file with size-aware packing
    (maxPartitionBytes), filters on metadata columns (pathGlobFilter,
    length) prune BEFORE content reads — the metadata-first discipline
    the multimodal family documents.
    """
    import os

    from ._util import work_dir

    imgs = png_images_df(spark, sf_dir, modulus=9)
    out_dir = work_dir("binfile", sf_dir)

    def dump(rows):
        for r in rows:
            with open(os.path.join(out_dir, f"doc_{r.doc_id}.png"), "wb") as f:
                f.write(bytes(r.png))

    imgs.foreachPartition(dump)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(out_dir)
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", "width", "height", "pixel_sum", "n_bytes_match")}
            for path, length, content in zip(pdf["path"], pdf["length"], pdf["content"]):
                blob = bytes(content)
                px = decode_png(blob)
                h, w = px.shape[:2]
                out["doc_id"].append(int(path.rsplit("doc_", 1)[1].split(".")[0]))
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
                out["n_bytes_match"].append(int(length) == len(blob))
            yield pd.DataFrame(out)

    return files.select("path", "length", "content").mapInPandas(
        decode_batches,
        "doc_id long, width int, height int, pixel_sum long, n_bytes_match boolean",
    )

"""Round-7 operator batch 12: gradient perceptual hash and the
bucket-expansion interval join.

- q_image_dhash: the second perceptual-hash family (difference hash —
  horizontal gradient signs), robust to global brightness/contrast
  shifts that move every aHash cell the same way.
- q_interval_bucket_join: THE scale pattern for point-in-interval
  joins — expand each interval to the fixed-width buckets it covers,
  equi-join points on bucket, re-check the exact range as a residual
  filter. Turns an O(N*M) theta join (q_join_theta_range's shape,
  BNLJ at best) into a shuffle-partitioned equi-join whose fan-out is
  interval_length/bucket_width.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.imagecodec import decode_png
from ..tables import tables
from .multimodal import _PIXEL_CTE, png_images_df
from .registry import query


def _dhash_bits(ch0: "np.ndarray") -> "np.ndarray":
    """8x8 horizontal-gradient sign bits of a 9x8 cell-mean grid
    (integer cross-product comparison; shared by the query and the
    brightness-invariance pytest)."""
    ch0 = ch0.astype(np.int64)
    h, w = ch0.shape
    gx = (np.arange(w, dtype=np.int64) * 9) // w
    gy = (np.arange(h, dtype=np.int64) * 8) // h
    idx = (gy[:, None] * 9 + gx[None, :]).ravel()
    s = np.bincount(idx, weights=ch0.ravel(), minlength=72).astype(np.int64).reshape(8, 9)
    m = np.bincount(idx, minlength=72).astype(np.int64).reshape(8, 9)
    return (s[:, :8] * m[:, 1:] > s[:, 1:] * m[:, :8]).ravel()


@query(
    "q_image_dhash",
    oracle=_PIXEL_CTE.format(modulus=11)
    + """,
    ch0 AS (
      SELECT doc_id, w, h, (j // c) % w AS x, (j // c) // w AS y, v
      FROM px WHERE j % c = 0
    ),
    cells AS (
      SELECT doc_id, (y * 8) // h AS gy, (x * 9) // w AS gx,
             SUM(v) AS s, COUNT(*) AS m
      FROM ch0 GROUP BY 1, 2, 3
    ),
    dims AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h FROM ch0 GROUP BY 1),
    bits AS (
      SELECT a.doc_id, a.gy * 8 + a.gx AS idx,
             CASE WHEN a.s * b.m > b.s * a.m THEN 1 ELSE 0 END AS bit
      FROM cells a JOIN cells b
        ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      WHERE a.gx < 8
    )
    SELECT b.doc_id,
           CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(SUM(CASE WHEN b.bit = 1 AND b.idx < 32
                         THEN CAST(1 AS BIGINT) << CAST(b.idx AS INT)
                         ELSE 0 END) AS BIGINT) AS hash_lo,
           CAST(SUM(CASE WHEN b.bit = 1 AND b.idx >= 32
                         THEN CAST(1 AS BIGINT) << CAST(b.idx - 32 AS INT)
                         ELSE 0 END) AS BIGINT) AS hash_hi
    FROM bits b JOIN dims d USING (doc_id)
    GROUP BY b.doc_id, d.w, d.h
    """,
    tags=("multimodal", "perceptual-hash", "dedup", "round7"),
)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference hash (dHash) over real decoded PNGs: a 9x8 grid of
    cell means, bit (gy*8+gx) set iff cell(gy,gx) > cell(gy,gx+1) —
    the horizontal-gradient fingerprint. Means are never materialized:
    the comparison is the integer cross-product s1*m2 > s2*m1, so the
    oracle recomputes identical bits from the SQL pixel definition.
    Complements q_image_ahash: a global brightness shift moves every
    aHash cell against the image mean but leaves every dHash gradient
    sign intact — two families catch what one misses (standard
    image-dedup practice).

    Scale shape: same Arrow-batched mapInPandas fan-out as aHash; one
    row of two 32-bit halves per image."""
    images = png_images_df(spark, sf_dir, modulus=11)

    def dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows: dict[str, list] = {
                k: [] for k in ("doc_id", "width", "height", "hash_lo", "hash_hi")
            }
            for did, png in zip(pdf["doc_id"], pdf["png"]):
                px = decode_png(bytes(png))
                ch0 = px if px.ndim == 2 else px[:, :, 0]
                flat = _dhash_bits(ch0)
                lo = int(sum(1 << i for i in range(32) if flat[i]))
                hi = int(sum(1 << (i - 32) for i in range(32, 64) if flat[i]))
                rows["doc_id"].append(int(did))
                rows["width"].append(ch0.shape[1])
                rows["height"].append(ch0.shape[0])
                rows["hash_lo"].append(lo)
                rows["hash_hi"].append(hi)
            yield pd.DataFrame(rows)

    return images.mapInPandas(
        dhash_batches,
        schema="doc_id long, width int, height int, hash_lo long, hash_hi long",
    )


@query(
    "q_interval_bucket_join",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS start_d,
             CAST(o_orderdate AS DATE) + INTERVAL (1 + o_orderkey % 14) DAY AS end_d,
             CAST(1 + o_orderkey % 14 AS BIGINT) AS span_days
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT iv.o_orderkey, iv.span_days,
           CAST(COUNT(l.l_shipdate) AS BIGINT) AS n_ships
    FROM iv LEFT JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE) >= iv.start_d
     AND CAST(l.l_shipdate AS DATE) < iv.end_d
    GROUP BY iv.o_orderkey, iv.span_days
    """,
    tags=("join", "interval", "bucketing", "round7"),
)
def q_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join at scale: per order a service window of
    1..14 days; count ALL lineitem shipments falling inside it. The
    naive form is a pure range-predicate theta join (the oracle's
    LEFT JOIN — a nested loop on any engine); the implementation here
    is the bucket-expansion rewrite: each interval explodes to the
    7-day buckets it covers (<= 3 per interval), points map to their
    single bucket, the join becomes a shuffle-partitioned EQUI-join on
    bucket, and the exact range check survives as a cheap residual
    filter. Fan-out is span/bucket_width, independent of table sizes —
    the standard time-range join strategy (same rewrite Databricks
    ships as range-join hints). Plan-asserted: no BNLJ, no cartesian.

    Scale shape: one shuffle keyed on bucket for each side; skewed hot
    buckets fall back to the existing salting tier."""
    li = tables(spark, sf_dir)["lineitem"]
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 2000)
    epoch = F.to_date(F.lit("1995-01-01"))
    iv = o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("start_d"),
        F.date_add(F.to_date("o_orderdate"), (1 + F.col("o_orderkey") % 14).cast("int")).alias(
            "end_d"
        ),
        (1 + F.col("o_orderkey") % 14).cast("bigint").alias("span_days"),
    ).withColumn("sb", F.floor(F.datediff(F.col("start_d"), epoch) / 7)).withColumn(
        "eb", F.floor(F.datediff(F.date_sub(F.col("end_d"), 1), epoch) / 7)
    )
    expanded = iv.withColumn("bucket", F.explode(F.sequence(F.col("sb"), F.col("eb"))))
    pts = li.select(F.to_date("l_shipdate").alias("ship_d")).withColumn(
        "bucket", F.floor(F.datediff(F.col("ship_d"), epoch) / 7)
    )
    matched = (
        expanded.join(pts, "bucket")
        .filter((F.col("ship_d") >= F.col("start_d")) & (F.col("ship_d") < F.col("end_d")))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ships"))
    )
    return (
        iv.select("o_orderkey", "span_days")
        .join(matched, "o_orderkey", "left")
        .select(
            "o_orderkey",
            "span_days",
            F.coalesce("n_ships", F.lit(0)).cast("bigint").alias("n_ships"),
        )
    )

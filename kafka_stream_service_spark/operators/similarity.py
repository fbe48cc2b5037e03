"""Similarity-search operators over array<float> embedding columns.

Two execution strategies, chosen by shape:

- ``knn_bruteforce``: few queries x big corpus — broadcast the queries,
  stream the corpus once, JVM-side fold for the dot product, per-query
  top-k window. No corpus shuffle; scales linearly with corpus size.
- ``blocked_cosine_pairs``: all-pairs within blocks — the pair count is
  quadratic per block, so the per-pair cost dominates; a numpy matmul
  inside ``applyInPandas`` beats the expression fold ~10x (BLAS, one
  Arrow batch per block). Python is justified here precisely because the
  built-in higher-order fold is interpreted per element.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (matches DuckDB list_sum
    left-to-right order for oracle-exact results)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, cosine).

    ``queries`` needs (query_id_col, emb_col); broadcast side.
    """
    q = queries.filter(F.col(emb_col).isNotNull()).select(
        F.col(query_id_col), F.col(emb_col).alias("_q_emb")
    )
    c = corpus.filter(F.col(emb_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_c_emb")
    )
    cos = cosine_col(F.col("_q_emb"), F.col("_c_emb"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col)).select(
        query_id_col, "neighbor_id", cos.alias("cos_raw")
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def blocked_cosine_pairs(
    vectors: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.2,
) -> DataFrame:
    """All pairs (id_a < id_b) within each block with cosine >= threshold.

    One shuffle on the block key; inside each block a single float64
    matmul scores every pair at BLAS speed. Output: (vec_a, vec_b, block,
    cosine rounded to 6).

    At 100 TB the block key is whatever bounds the pair space (LSH bucket,
    shard, time window); a block must fit one executor's memory — cap or
    re-block otherwise.

    Null embeddings are filtered before grouping (a ragged batch would
    crash the matmul); dimensionality is assumed uniform upstream.
    """

    out_schema = f"vec_a long, vec_b long, {block_col} int, cosine double"

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in pdf[emb_col]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        # Threshold the ROUNDED cosine: numpy's pairwise/SIMD summation and
        # an oracle's sequential fold can differ in the last ulps, so a raw
        # cut at exactly `threshold` could keep a pair on one engine and
        # drop it on the other. Rounding to 6 first makes the cut decision
        # identical everywhere (oracles filter on round(cosine, 6) too).
        vals = np.round(sims[ia, ib], 6)
        keep = vals >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        swap = a > b
        return pd.DataFrame(
            {
                "vec_a": np.where(swap, b, a),
                "vec_b": np.where(swap, a, b),
                block_col: pdf[block_col].iloc[0],
                "cosine": vals[keep],
            }
        )

    return (
        vectors.filter(F.col(emb_col).isNotNull())
        .groupBy(block_col)
        .applyInPandas(score_block, schema=out_schema)
    )

"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for embedding search (the brute-force baseline is
operators/similarity.py): partition the corpus into Voronoi cells around
trained centroids, search only the closest ``n_probe`` cells per query.

Training (two entries, same contract — k centroid vectors on the driver):

- ``train_ivf_centroids_sampled`` (DEFAULT, the production path): one
  corpus scan pulls a deterministic hash-spread sample of bounded size to
  the driver, Lloyd's k-means runs vectorized in numpy. This is the
  standard large-scale recipe (FAISS et al. train IVF on a memory-bounded
  sample); driver state is sample_size x dim floats — a knob, not a
  function of corpus size, so it holds at 100 TB.
- ``train_ivf_centroids`` (fully distributed): every Lloyd step is a
  DataFrame job — assignment map-side against broadcast centroids, update
  via posexplode + groupBy(cell, pos) so the shuffle carries (cell, pos,
  partial sum) rows instead of a dim-wide aggregate expression. Use when
  even the training sample must not be collected.

Search: assignment and probe selection are Arrow-batched pandas UDFs —
one BLAS matmul per batch against the broadcast (k x dim) centroid matrix.
The JVM formulation (k unrolled zip_with/aggregate higher-order
expressions) was measured ~10x slower at k=16/dim=64: codegen size grows
with k x dim while numpy's |x|^2 - 2xC^T + |c|^2 is one gemm.

At 100 TB: train on the sample, assign once, store cell ids alongside
vectors; queries then touch n_probe/k of the data. Recall < 1 by
construction — callers verify candidates exactly (same contract as LSH).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .similarity import dot_col, norm_col


def _sample_matrix(
    df: DataFrame, id_col: str, emb_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic hash-spread sample as a (<=sample_size, dim) float64
    matrix. orderBy+limit is a TakeOrdered (no global sort materialization);
    the hash spreads the sample across the id space, ties broken by id so
    the result is stable run-to-run."""
    rows = (
        df.filter(F.col(emb_col).isNotNull())
        .withColumn("_h", F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31)))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .select(emb_col)
        .collect()
    )
    return np.array([list(map(float, r[0])) for r in rows], dtype=np.float64)


def _lloyd_numpy(mat: np.ndarray, k: int, iterations: int) -> list[list[float]]:
    """Vectorized Lloyd refinement; init = first k sample rows (the sample
    is already hash-spread, so this is a deterministic spread seed).
    Empty cells keep their previous centroid (same rule as the
    distributed trainer)."""
    cents = mat[:k].copy()
    for _ in range(iterations):
        # squared L2 via |x|^2 - 2xC^T + |c|^2; argmin ties -> lowest cell
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * mat @ cents.T
            + (cents * cents).sum(axis=1)
        )
        cell = d2.argmin(axis=1)
        for c in range(k):
            members = mat[cell == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def train_ivf_centroids_sampled(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 16,
    iterations: int = 3,
    sample_size: int = 2048,
) -> list[list[float]]:
    """Sample-based k-means: ONE corpus scan (the sample pull), then
    in-memory numpy Lloyd. ``sample_size`` bounds driver memory
    (sample_size x dim doubles) independent of corpus size."""
    mat = _sample_matrix(corpus, id_col, emb_col, max(sample_size, k))
    if len(mat) < k:
        raise ValueError(f"corpus has {len(mat)} non-null vectors < k={k}")
    return _lloyd_numpy(mat, k, iterations)


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 16,
    iterations: int = 3,
) -> list[list[float]]:
    """Fully distributed fixed-iteration Lloyd refinement.

    Centroids live on the driver (k x dim floats — trivially small); the
    corpus is only ever scanned, never collected. Training scans the
    corpus ``iterations + 1`` times (seed pick + one assignment per Lloyd
    step), so the pruned (id, embedding) projection is persisted for the
    duration. The update shuffles (cell, pos) partial sums via posexplode
    — k x dim x partitions rows — instead of a dim-wide column list, so
    the plan size is independent of dim.
    """
    train = corpus.select(id_col, emb_col).filter(F.col(emb_col).isNotNull()).persist()
    try:
        mat = _sample_matrix(train, id_col, emb_col, k)
        if len(mat) < k:
            raise ValueError(f"corpus has {len(mat)} non-null vectors < k={k}")
        cents = [list(map(float, c)) for c in mat]
        for _ in range(iterations):
            assigned = assign_cells(train, cents, emb_col=emb_col)
            sums = (
                assigned.select("cell", F.posexplode(F.col(emb_col)).alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new = [list(c) for c in cents]
            for r in sums:
                new[r["cell"]][r["pos"]] = r["s"] / r["n"]
            cents = new
        return cents
    finally:
        train.unpersist()


def _cent_matrix(centroids: list[list[float]]) -> np.ndarray:
    return np.array(centroids, dtype=np.float64)


def _dists_to(block: pd.Series, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, k) squared-L2 distance matrix for a batch of embedding cells;
    second return is the null mask."""
    null = block.isna().to_numpy()
    safe = [np.zeros(cents.shape[1]) if n else np.asarray(v, dtype=np.float64) for v, n in zip(block, null)]
    mat = np.stack(safe) if safe else np.zeros((0, cents.shape[1]))
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * mat @ cents.T
        + (cents * cents).sum(axis=1)
    )
    return d2, null


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
) -> DataFrame:
    """Adds a ``cell`` column: index of the nearest centroid (squared L2,
    ties -> lowest cell). One Arrow-batched gemm per batch; null
    embeddings get cell -1 (callers filter or keep as a reject lane)."""
    cents = _cent_matrix(centroids)

    @pandas_udf("int")
    def nearest(block: pd.Series) -> pd.Series:
        d2, null = _dists_to(block, cents)
        out = d2.argmin(axis=1).astype("int32")
        out[null] = -1
        return pd.Series(out)

    # coalesce(-1) is a semantic no-op (the UDF already emits -1 for
    # null embeddings, never NULL) but it makes ``cell`` provably
    # NON-NULLABLE to Catalyst. Without it, an inner join on cell
    # infers isnotnull(cell) and pushes that predicate through any
    # upstream exchange — re-evaluating the Python UDF BELOW the
    # fan-out at raw scan width (one task on a single-file fixture;
    # caught by the python-lane plan gate). With it, the inferred
    # IsNotNull folds to true and the UDF runs once, above the
    # exchange.
    return corpus.withColumn(
        "cell", F.coalesce(nearest(F.col(emb_col)), F.lit(-1))
    )


def nearest_cells(
    centroids: list[list[float]], n_probe: int
):
    """Column function: embedding -> array<int> of the n_probe nearest
    cell ids, closest first (stable argsort — ties by cell id, matching
    the JVM struct-sort it replaces)."""
    cents = _cent_matrix(centroids)

    @pandas_udf("array<int>")
    def probes(block: pd.Series) -> pd.Series:
        d2, null = _dists_to(block, cents)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series([None if n else list(o) for o, n in zip(order, null)])

    return probes


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: search only each query's n_probe nearest
    cells. Returns (query_id, neighbor_id, rank, cosine).

    Probe assignment is fully distributed (no query collect — a large
    query set would bottleneck/OOM the driver otherwise): each query row
    computes its n_probe nearest cells map-side (one gemm per Arrow
    batch) and explodes. The probe frame is |queries| x n_probe rows and
    broadcasts into the cell join, so the corpus still moves zero times.

    Fan-out policy (r15, the r14 q_knn_ivf bench regression): the
    operator owns the width decision for BOTH of its Arrow lanes, so
    callers must NOT pre-fan either input. The CORPUS assignment gemm is
    the data-scale lane and gets ranks.cpu_fanout here (a no-op at
    production scan widths). The QUERY probe lane is broadcast-bound —
    its output collapses into a BroadcastExchange, bounded by the
    broadcast threshold — so fanning it buys no usable parallelism and
    costs a real shuffle + stage (measured: the r14 call-site fan put
    round-robin exchanges on both join inputs and moved the row
    1.47 -> 2.02 s). plans.python_lane_offenders exempts broadcast
    build sides for exactly this reason.
    """
    from pyspark.sql import Window as W

    from .ranks import cpu_fanout

    # Null embeddings are rejected JVM-side BEFORE the assignment UDF:
    # an isNotNull predicate pushes to the scan, whereas the old
    # post-UDF ``cell >= 0`` filter was pushed through any upstream
    # fan-out exchange BY CATALYST — dragging the ArrowEvalPython
    # evaluation below the exchange, back onto the raw scan's width
    # (one task on a single-file fixture; the python-lane gate caught
    # it). With non-null input every cell id is >= 0 by construction.
    cells = (
        assign_cells(
            cpu_fanout(corpus.filter(F.col(emb_col).isNotNull())),
            centroids,
            emb_col=emb_col,
        )
        .select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_c_emb"), "cell")
    )

    probe_fn = nearest_cells(centroids, n_probe)
    probes = (
        queries.filter(F.col(emb_col).isNotNull())
        .select(
            query_id_col,
            F.col(emb_col).cast("array<double>").alias("_q_emb"),
            F.explode(probe_fn(F.col(emb_col))).alias("cell"),
        )
    )

    cos = dot_col(F.col("_q_emb"), F.col("_c_emb")) / (
        norm_col(F.col("_q_emb")) * norm_col(F.col("_c_emb"))
    )
    # No dedup needed: every corpus vector lives in exactly ONE cell and
    # the probe frame has unique (query, cell) rows, so (query, neighbor)
    # pairs are unique by construction — a dropDuplicates here would be a
    # pure extra shuffle.
    pairs = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", cos.alias("cos_raw"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )

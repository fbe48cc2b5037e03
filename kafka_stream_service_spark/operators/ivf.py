"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for embedding search (the brute-force baseline is
operators/similarity.py): partition the corpus into Voronoi cells around
trained centroids, search only the closest ``n_probe`` cells per query.

Training: deterministic k-means — initial centroids are a hash-spread
sample of the corpus (vec_id-based, no RNG), refined with a fixed number
of Lloyd iterations. Every step is a DataFrame job:

- assignment: cross join corpus x centroids (centroids broadcast; k is
  small) -> argmin distance — one scan per iteration, no shuffle of the
  corpus itself beyond the assignment groupBy;
- update: groupBy(cell) average — partial aggregation applies.

At 100 TB: train on a sample (the sample fraction is the knob), assign
once, store cell ids alongside vectors; queries then touch n_probe/k of
the data. Recall < 1 by construction — callers verify candidates exactly
(same contract as LSH).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot_col, norm_col


def _centroid_rows(df: DataFrame, id_col: str, emb_col: str, k: int) -> list[list[float]]:
    """Deterministic initial centroids: k hash-spread corpus vectors."""
    rows = (
        df.withColumn("_h", F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31)))
        .orderBy("_h")
        .limit(k)
        .select(emb_col)
        .collect()
    )
    return [list(map(float, r[0])) for r in rows]


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 16,
    iterations: int = 3,
) -> list[list[float]]:
    """Fixed-iteration Lloyd refinement; returns k centroid vectors.

    Centroids live on the driver (k x dim floats — trivially small); the
    corpus is only ever scanned, never collected. Training scans the
    corpus ``iterations + 1`` times (seed pick + one assignment per
    Lloyd step), so the pruned (id, embedding) projection is persisted
    for the duration and explicitly unpersisted after — at 100 TB the
    production entry is training on a sample anyway (pass a sampled
    ``corpus``; the fraction is the knob), and the persist then caches
    only that sample.
    """
    train = corpus.select(id_col, emb_col).persist()
    try:
        cents = _centroid_rows(train, id_col, emb_col, k)
        for _ in range(iterations):
            assigned = assign_cells(train, cents, emb_col=emb_col)
            dim = len(cents[0])
            sums = (
                assigned.groupBy("cell")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.element_at(F.col(emb_col), i + 1).cast("double")).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            new = list(cents)
            for r in sums:
                new[r["cell"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
            cents = new
        return cents
    finally:
        train.unpersist()


def _dist_array(emb: Column, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances from ``emb`` to every centroid, as ONE
    array column (see assign_cells docstring for why not chained whens)."""
    dist_exprs = []
    for c in centroids:
        cent = F.array(*[F.lit(float(x)) for x in c])
        dist_exprs.append(
            F.aggregate(
                F.zip_with(emb, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*dist_exprs)


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
) -> DataFrame:
    """Adds a ``cell`` column: index of the nearest centroid (L2).

    Centroids unroll into the plan as literal arrays (k is small); the
    k distances land in ONE array column and the argmin reads that column
    — never chain per-centroid ``when`` expressions (each step embeds the
    previous tree 3x over: exponential plan blowup, planner OOM at k=16).
    """
    with_d = corpus.withColumn("_dists", _dist_array(F.col(emb_col), centroids))
    return with_d.withColumn(
        "cell", (F.array_position(F.col("_dists"), F.array_min(F.col("_dists"))) - 1).cast("int")
    ).drop("_dists")


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
    computes its centroid-distance array map-side, pairs every distance
    with its cell index, array_sorts the (distance, cell) structs
    (lexicographic struct order = by distance, ties by cell — a
    deterministic argsort with no shuffle), slices the n_probe head and
    explodes. The probe frame is |queries| x n_probe rows and broadcasts
    into the cell join, so the corpus still moves zero times.
    """
    from pyspark.sql import Window as W

    cells = assign_cells(corpus, centroids, emb_col=emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_c_emb"), "cell"
    )

    paired = F.transform(
        _dist_array(F.col(emb_col), centroids),
        lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
    )
    probes = (
        queries.select(
            query_id_col,
            F.col(emb_col).cast("array<double>").alias("_q_emb"),
            F.explode(F.slice(F.array_sort(paired), 1, n_probe)).alias("_probe"),
        )
        .select(query_id_col, F.col("_probe.cell").cast("int").alias("cell"), "_q_emb")
    )

    cos = dot_col(F.col("_q_emb"), F.col("_c_emb")) / (
        norm_col(F.col("_q_emb")) * norm_col(F.col("_c_emb"))
    )
    pairs = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", cos.alias("cos_raw"))
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )

"""Similarity search over the embedding column (array<float>, 64-dim).

Three tiers:

- brute-force cosine top-k: exact baseline; the dot product is a JVM-side
  higher-order fold (zip_with + aggregate) — no Python in the loop. The
  query side is tiny and broadcast, so the big side streams once: at 100 TB
  this is one scan, no shuffle except the final per-query top-k.
- threshold pairs within label blocks: blocked exact search.
- random-hyperplane LSH buckets: the scale path — sign-bit bucketing cuts
  candidates superlinearly; recall < 1 so it's a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.similarity import blocked_cosine_pairs, dot_col as dot, knn_bruteforce, norm_col as norm
from ..tables import tables
from .registry import query


COSINE_SQL = """
  list_sum(list_transform(range(1, 65), i -> CAST(qa.embedding[i] AS DOUBLE) * CAST(ca.embedding[i] AS DOUBLE)))
  / ( sqrt(list_sum(list_transform(qa.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
    * sqrt(list_sum(list_transform(ca.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) )
"""


@query(
    "q_knn_cosine_bruteforce",
    oracle=f"""
    WITH pairs AS (
      SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
             {COSINE_SQL} AS cos_raw
      FROM embeddings qa JOIN embeddings ca ON ca.vec_id != qa.vec_id
      WHERE qa.vec_id < 8
    )
    SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
    tags=("similarity", "knn", "llm-data"),
)
def q_knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 8 query vectors (broadcast the
    queries, stream the corpus once, per-query top-k via window)."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    return knn_bruteforce(e, q, k=5)


@query(
    "q_cosine_pairs_blocked",
    oracle=f"""
    SELECT qa.vec_id AS vec_a, ca.vec_id AS vec_b, qa.label,
           round({COSINE_SQL}, 6) AS cosine
    FROM embeddings qa
    JOIN embeddings ca ON qa.label = ca.label AND qa.vec_id < ca.vec_id
    WHERE round({COSINE_SQL}, 6) >= 0.2
    """,
    tags=("similarity", "blocked", "llm-data"),
)
def q_cosine_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs within label blocks (cosine >= 0.2).

    Blocking on label keeps the pair space linear-ish; the same plan shape
    serves any blocking key (LSH bucket, shard, time window) at scale.
    """
    e = tables(spark, sf_dir)["embeddings"]
    return blocked_cosine_pairs(e, block_col="label", threshold=0.2).select(
        "vec_a", "vec_b", "label", "cosine"
    )


@query(
    "q_dedup_embedding_cosine",
    oracle=f"""
    WITH pairs AS (
      SELECT qa.vec_id AS vec_a, ca.vec_id AS vec_b, qa.label,
             round({COSINE_SQL}, 6) AS cosine
      FROM embeddings qa
      JOIN embeddings ca ON qa.label = ca.label AND qa.vec_id < ca.vec_id
      WHERE round({COSINE_SQL}, 6) >= 0.3
    )
    SELECT label, vec_b AS dup_id, MIN(vec_a) AS canonical_id,
           MAX(cosine) AS best_cosine
    FROM pairs
    GROUP BY label, vec_b
    """,
    tags=("similarity", "dedup", "llm-data"),
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: drop any vector with an
    earlier (lower vec_id) neighbor at cosine >= 0.3 in its label block;
    emit the dropped→canonical mapping (single-pass semantics — the
    transitive-closure variant is q_dedup_clusters).

    Same one-shuffle blocked-matmul plan as q_cosine_pairs_blocked plus a
    groupBy on the dup id; at 100 TB the block key becomes an LSH bucket
    so the pair space stays bounded.
    """
    e = tables(spark, sf_dir)["embeddings"]
    pairs = blocked_cosine_pairs(e, block_col="label", threshold=0.3)
    return pairs.groupBy("label", F.col("vec_b").alias("dup_id")).agg(
        F.min("vec_a").alias("canonical_id"),
        F.max("cosine").alias("best_cosine"),
    )


@query(
    "q_embedding_stats_by_label",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           round(CAST(SUM(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS DOUBLE) / COUNT(*), 4) AS avg_norm_sq,
           round(CAST(MAX(list_max(embedding)) AS DOUBLE), 6) AS max_component,
           round(CAST(MIN(list_min(embedding)) AS DOUBLE), 6) AS min_component
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "agg", "llm-data"),
)
def q_embedding_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding profile (norm distribution, component range)."""
    e = tables(spark, sf_dir)["embeddings"]
    emb = F.col("embedding")
    norm_sq = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum(norm_sq) / F.count(F.lit(1)), 4).alias("avg_norm_sq"),
        F.round(F.max(F.array_max(emb)).cast("double"), 6).alias("max_component"),
        F.round(F.min(F.array_min(emb)).cast("double"), 6).alias("min_component"),
    )


# LSH: 8 deterministic pseudo-random hyperplanes. Plane p component i is
# derived from a hash of (p, i) mapped into [-1, 1) — reproducible with no
# RNG state, computable on any engine.
LSH_PLANES = 8
LSH_DIM = 64


def _plane_component(p: int, i: int) -> float:
    # splitmix64-ish integer scramble, then map to [-1, 1)
    x = (p * 1000003 + i * 7919 + 12345) & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = x ^ (x >> 16)
    return (x / 2147483648.0) - 1.0


LSH_PLANE_VALUES = [
    [_plane_component(p, i) for i in range(LSH_DIM)] for p in range(LSH_PLANES)
]


def hyperplane_bucket(emb: F.Column) -> F.Column:
    """8-sign-bit bucket id (0..255) for an embedding column — the
    shared bucket expression of q_knn_lsh_buckets, exposed so tests can
    bound its recall on planted near-dup vectors."""
    bucket = None
    for p in range(LSH_PLANES):
        plane = F.array(*[F.lit(v) for v in LSH_PLANE_VALUES[p]])
        proj = F.aggregate(
            F.zip_with(emb, plane, lambda x, w_: x.cast("double") * w_),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket.bitwiseOR(bit)
    return bucket


@query(
    "q_knn_lsh_buckets",
    oracle=None,  # approximate (recall<1) — driver rows-only check
    tags=("similarity", "lsh", "llm-data"),
    portable_twin="q_knn_lsh_buckets_portable",
)
def q_knn_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits -> 256 buckets; then exact cosine
    within buckets for pairs above threshold.

    This is the scale path for q_cosine_pairs_blocked: expected bucket size
    is n/256, so candidate pairs drop ~256x vs all-pairs while keeping high
    recall for cosine >= 0.9 near-dups. Deterministic planes (hash-derived,
    no RNG state) keep the query reproducible across runs and engines.
    """
    e = tables(spark, sf_dir)["embeddings"]
    bucketed = e.select(
        "vec_id", "embedding", hyperplane_bucket(F.col("embedding")).alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (norm(F.col("emb_a")) * norm(F.col("emb_b")))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.2)
        .select("vec_a", "vec_b", "bucket", F.round("cos_raw", 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )

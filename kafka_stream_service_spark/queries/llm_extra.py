"""LLM-data pipeline depth: TF-IDF, near-dup clustering (connected
components), IVF approximate nearest neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents
    ), tf_raw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf_count FROM tf_raw GROUP BY 1, 2
    ), df_ AS (
      SELECT token, COUNT(*) AS df_count FROM tokens GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf_count,
           round(tf_count * ln((CAST(n_docs AS DOUBLE) + 1) / (df_count + 1)), 6) AS tfidf
    FROM tf JOIN df_ USING (token) CROSS JOIN n
    WHERE doc_id < 10
    """,
    tags=("text", "tfidf", "llm-data"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring (smoothed idf): term frequency x inverse document
    frequency, the foundational text-weighting op. Two shuffles total
    (tf groupBy, df groupBy); idf joins back via broadcast (vocabulary
    << corpus)."""
    d = tables(spark, sf_dir)["documents"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_count"))
    df_ = (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_count"))
    )
    n_docs = d.count()
    tfidf = F.round(
        F.col("tf_count") * F.log((F.lit(float(n_docs)) + 1) / (F.col("df_count") + 1)), 6
    )
    return (
        tf.filter(F.col("doc_id") < 10)
        .join(F.broadcast(df_), "token")
        .select("doc_id", "token", "tf_count", tfidf.alias("tfidf"))
    )


@query(
    "q_dedup_clusters",
    oracle=None,  # built on xxhash64/blake2b minhash pairs — rows-only
    tags=("dedup", "graph", "llm-data"),
    portable_twin="q_dedup_clusters_portable",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH pairs -> connected components
    -> one canonical doc per cluster (the full production dedup flow:
    candidate pairs alone don't dedup, components do).

    Output: (cluster, doc_id, is_canonical) for docs in non-trivial
    clusters, ordered for determinism.
    """
    from ..operators import lsh_candidate_pairs, minhash_frame
    from ..operators.dedup import jaccard
    from ..operators.graph import connected_components

    d = tables(spark, sf_dir)["documents"]
    sh = minhash_frame(d, n=3, k=16).filter(F.size("shingles") > 0).persist()
    cand = lsh_candidate_pairs(
        sh, id_col="doc_id", shingle_col="shingles", k=16, bands=4, sig_col="sig"
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    edges = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comps = connected_components(edges, max_iter=8)
    return (
        comps.select(
            F.col("comp").alias("cluster"),
            F.col("node").alias("doc_id"),
            (F.col("node") == F.col("comp")).alias("is_canonical"),
        )
        .orderBy("cluster", "doc_id")
    )


@query(
    "q_knn_ivf",
    oracle=None,  # approximate (recall < 1 by construction) — rows-only
    tags=("similarity", "ivf", "ann", "llm-data"),
    portable_twin="q_ivf_probe_portable",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 neighbors for 8 queries: deterministic
    k-means cells (16 centroids, 3 Lloyd iterations trained on a
    hash-spread sample — ONE corpus scan, the production recipe; the
    fully distributed trainer stays available in operators/ivf.py),
    probe the 8 nearest cells per query (the scale path next to
    q_knn_cosine_bruteforce's exact baseline)."""
    from ..operators.ivf import ivf_knn, train_ivf_centroids_sampled

    # No call-site fan (r15): ivf_knn owns the width of its Arrow lanes
    # — it fans the corpus assignment gemm internally and deliberately
    # leaves the broadcast-bound probe lane at scan width. The r14
    # call-site cpu_fanout wrapped BOTH derived branches and put a
    # round-robin exchange under the 8-row broadcast probe side for
    # nothing (1.47 -> 2.02 s). The sampled trainer is JVM-side
    # (hash-spread orderBy+limit collect) — no Arrow lane to widen.
    e = tables(spark, sf_dir)["embeddings"]
    cents = train_ivf_centroids_sampled(e, k=16, iterations=3, sample_size=2048)
    q = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    return ivf_knn(e, q, cents, k=5, n_probe=8).orderBy("query_id", "rank")

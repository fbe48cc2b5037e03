"""Round-11 queries: the stored-index pattern lifted to embedding space.

VERDICT r10 #6: compose the persisted-artifact shape (build once per
corpus snapshot, probes read) with SemDeDup — new vectors assign to the
STORED centroids and edge-score only against their cluster's STORED
members, so a semantic-dedup refresh costs O(delta x cluster occupancy)
instead of a full recompute. The oracle derives the FULL edge set and
filters to delta-crossing rows, so the driver's hash verdict proves
stored-index-probe == full-recompute on exactly the rows a refresh
appends to the duplicate graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .clustering import _ASSIGN_SQL, K, _assignments
from .corpus_ops import _QUANT_SQL, _quantized
from .registry import query
from .round10 import _SEM_TAU2_BP

# ---------------------------------------------------------------------------
# Stored semantic index: (vec_id, centroid_id, qv, nrm) — the assignment
# table SemDeDup's pair stage reads, persisted like the pair/bucket index.
# ---------------------------------------------------------------------------

# Revision token baked into the artifact path: bump whenever the
# quantization or assignment derivation changes so a stale on-disk index
# from older code can never serve wrong members.
SEM_INDEX_REV = f"r1k{K}t{_SEM_TAU2_BP}"


def sem_index_path(sf_dir: str) -> str:
    import os

    from ._util import snapshot_dir, table_fingerprint

    return os.path.join(
        snapshot_dir("sem_index", sf_dir),
        f"{SEM_INDEX_REV}_{table_fingerprint(sf_dir, 'embeddings')}",
    )


def build_sem_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the semantic index: every vector's int8 quantization, its
    nearest stored centroid, and its integer norm — the cluster-member
    table an incremental SemDeDup probe joins against. Published
    atomically (temp sibling + rename) and sorted by centroid_id so the
    probe's per-cluster reads hit tight zone maps."""
    from ._util import publish_atomic

    e = _quantized(tables(spark, sf_dir)["embeddings"])
    assign = _assignments(spark, sf_dir).select("vec_id", "centroid_id")
    nrm = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("qv"), lambda a, b: a.cast("bigint") * b.cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    m = assign.join(e.select("vec_id", "qv"), "vec_id").select(
        "vec_id", "centroid_id", "qv", nrm.alias("nrm")
    )
    out = sem_index_path(sf_dir)
    publish_atomic(m, out, sort_cols=("centroid_id", "vec_id"))
    return spark.read.parquet(out)


def sem_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored semantic index for probes: read the persisted artifact when
    present, else build once (self-healing; deterministic derivation
    means read-vs-build can never disagree)."""
    import os

    out = sem_index_path(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        return build_sem_index(spark, sf_dir)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# SemDeDup cross-snapshot delta: new vectors probe the stored index
# ---------------------------------------------------------------------------

_SEM_DELTA_MOD = 10
_SEM_DELTA_REM = 7  # vec_id % 10 == 7 -> the "newly arrived" slice (~10%)


@query(
    "q_semdedup_delta_edges",
    oracle=f"""
    WITH {_QUANT_SQL},
    {_ASSIGN_SQL},
    m AS (
      SELECT s.vec_id, s.centroid_id, q.qv,
             CAST(list_dot_product(q.qv, q.qv) AS BIGINT) AS nrm
      FROM assign s JOIN q8 q USING (vec_id)
    ),
    edges AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.centroid_id,
             CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
             a.nrm AS nrm_a, b.nrm AS nrm_b
      FROM m a JOIN m b ON b.centroid_id = a.centroid_id AND b.vec_id > a.vec_id
      WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT) > 0
        AND 10000 * CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
                  * CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
            >= {_SEM_TAU2_BP} * a.nrm * b.nrm
    )
    SELECT id_a, id_b, CAST(centroid_id AS INT) AS centroid_id, dot,
           CAST(FLOOR(1000000.0 * (CAST(dot AS DOUBLE)
                / sqrt(CAST(nrm_a AS DOUBLE) * CAST(nrm_b AS DOUBLE))))
                AS BIGINT) AS cos_q6,
           CAST((CASE WHEN id_a % {_SEM_DELTA_MOD} = {_SEM_DELTA_REM} THEN 1 ELSE 0 END)
              + (CASE WHEN id_b % {_SEM_DELTA_MOD} = {_SEM_DELTA_REM} THEN 1 ELSE 0 END)
              AS INT) AS n_delta_endpoints
    FROM edges
    WHERE id_a % {_SEM_DELTA_MOD} = {_SEM_DELTA_REM}
       OR id_b % {_SEM_DELTA_MOD} = {_SEM_DELTA_REM}
    """,
    tags=("similarity", "dedup", "semdedup", "incremental", "llm-data", "round11"),
)
def q_semdedup_delta_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup refresh, production shape (VERDICT r10 #6):
    the ~10% "newly arrived" vector slice (vec_id % {_SEM_DELTA_MOD} ==
    {_SEM_DELTA_REM}) is quantized fresh — linear in the delta — and
    assigned to the STORED centroids; edge scoring then runs each new
    vector against ONLY its cluster's stored members (one exact int64
    delta-rows x member-matrix matmul per cluster block, the audited
    q_semdedup_prune treatment), emitting the duplicate-graph edges with
    at least one delta endpoint — exactly the rows a semantic-dedup
    refresh appends. The base corpus is never re-quantized or
    re-assigned: its side of every dot comes from the sem_index parquet.
    The oracle derives the FULL edge set and filters, so the hash
    verdict proves stored-index-probe == full-recompute.

    Exactness: quantization of the delta slice reproduces the stored
    values bit-for-bit (same derivation); dots and norms are integers
    end to end; the pair cosine is one floor-quantized pure-double
    expression of exact integers < 2^53.

    Scale shape: probe cost is O(delta x cluster occupancy) — SemDeDup
    at production scale picks k proportional to n precisely so cluster
    populations stay bounded — plus a broadcast of the K stored
    centroids for delta assignment. Self-healing: a cold run builds the
    index artifact once, like the pair-snapshot consumers.
    """
    import numpy as np
    import pandas as pd

    is_delta = (F.col("vec_id") % _SEM_DELTA_MOD) == _SEM_DELTA_REM
    stored = sem_index(spark, sf_dir)

    # Delta side: quantize the new slice fresh, assign to STORED
    # centroids (the K index rows with vec_id < K, broadcast).
    dq = _quantized(
        tables(spark, sf_dir)["embeddings"].filter(is_delta)
    ).select("vec_id", "qv")
    cent = stored.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cqv")
    )
    diff2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cqv"),
            lambda a, b: (a - b).cast("bigint") * (a - b).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    keyed = dq.crossJoin(F.broadcast(cent)).select(
        "vec_id", "qv", (diff2 * K + F.col("cid")).alias("key")
    )
    assigned = (
        keyed.groupBy("vec_id")
        .agg(F.min("key").alias("key"), F.first("qv").alias("qv"))
        .select(
            "vec_id",
            (F.col("key") % K).cast("int").alias("centroid_id"),
            "qv",
        )
    )

    # Per-cluster block: delta rows x ALL stored members (base members
    # come from parquet; delta members re-enter as the fresh rows so
    # delta-delta edges are found too — dedup'd canonically below).
    members = stored.filter(~is_delta).select(
        "centroid_id", "vec_id", "qv", F.lit(1).alias("is_base")
    )
    probes = assigned.select(
        "centroid_id", "vec_id", "qv", F.lit(0).alias("is_base")
    )

    def edge_block(pdf: pd.DataFrame) -> pd.DataFrame:
        new = pdf[pdf["is_base"] == 0]
        if new.empty or len(pdf) < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "dot": pd.Series(dtype="int64"),
                    "nrm_a": pd.Series(dtype="int64"),
                    "nrm_b": pd.Series(dtype="int64"),
                }
            )
        all_ids = pdf["vec_id"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
        nrm = (mat * mat).sum(axis=1)
        didx = np.flatnonzero((pdf["is_base"] == 0).to_numpy())
        dots = mat[didx] @ mat.T  # delta rows x all members, exact int64
        di, aj = np.nonzero(dots)  # candidates must have dot != 0 anyway
        d = dots[di, aj]
        gi = didx[di]  # global row of the delta endpoint
        keep = (
            (gi != aj)
            & (d > 0)
            & (10000 * d * d >= _SEM_TAU2_BP * nrm[gi] * nrm[aj])
        )
        a_ids, b_ids = all_ids[gi[keep]], all_ids[aj[keep]]
        swap = a_ids > b_ids
        return pd.DataFrame(
            {
                "id_a": np.where(swap, b_ids, a_ids),
                "id_b": np.where(swap, a_ids, b_ids),
                "dot": d[keep],
                "nrm_a": np.where(swap, nrm[aj[keep]], nrm[gi[keep]]),
                "nrm_b": np.where(swap, nrm[gi[keep]], nrm[aj[keep]]),
            }
        )

    edges = (
        members.unionByName(probes)
        .groupBy("centroid_id")
        .applyInPandas(
            edge_block,
            schema="id_a long, id_b long, dot long, nrm_a long, nrm_b long",
        )
    )
    # delta-delta edges surface once per endpoint's probe row — collapse
    # to the canonical pair. centroid_id re-attaches from the stored
    # index at edge grain (both endpoints share it by construction).
    cent_of = stored.select(F.col("vec_id").alias("id_a"), "centroid_id")
    return (
        edges.dropDuplicates(["id_a", "id_b"])
        .join(cent_of, "id_a")
        .select(
            "id_a",
            "id_b",
            F.col("centroid_id").cast("int").alias("centroid_id"),
            "dot",
            F.floor(
                F.lit(1000000.0)
                * (
                    F.col("dot").cast("double")
                    / F.sqrt(F.col("nrm_a").cast("double") * F.col("nrm_b").cast("double"))
                )
            )
            .cast("bigint")
            .alias("cos_q6"),
            (
                ((F.col("id_a") % _SEM_DELTA_MOD) == _SEM_DELTA_REM).cast("int")
                + ((F.col("id_b") % _SEM_DELTA_MOD) == _SEM_DELTA_REM).cast("int")
            ).alias("n_delta_endpoints"),
        )
    )

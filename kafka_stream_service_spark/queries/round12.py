"""Round-12 batch 1: stored-index lifecycle completion — snapshot
retention/GC (VERDICT r11 next-steps #4) and the IVF index's missing
incremental-refresh leg (next-steps #5).

Every stored index in the catalog (pair buckets, semantic clusters,
text postings, KN LM) follows build-once / probe-many with atomic
publication — but revisions accumulated forever, and the ANN tier had
build + serve + recall-audit legs with no refresh. These two queries
close both gaps, each certified by the driver's DuckDB hash gate.

Reference parity note: the reference (StreamsApplication.java) has no
index surface; this extends the mandated stored-index tier with its
operational lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .clustering import K, _ASSIGN_SQL
from .corpus_ops import _QUANT_SQL, _quantized
from .registry import query
from .round10b import _DELTA_MOD, _DELTA_REM

# ---------------------------------------------------------------------------
# Snapshot retention / GC, certified by a survivor census
# ---------------------------------------------------------------------------

_GC_TAG = "gc_demo"
_GC_REVS = 5
_GC_KEEP_LATEST = 2
_GC_PIN_REV = 1  # explicitly pinned artifact (rollback target)
_GC_KEPT = (4, 3, _GC_PIN_REV)  # newest 2 by recency + the pinned rev


@query(
    "q_snapshot_gc_census",
    oracle=f"""
    WITH revs AS (
      SELECT CAST(i AS BIGINT) AS rev_ix FROM range(0, {_GC_REVS}) t(i)
    ),
    m AS (
      SELECT r.rev_ix,
             CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_src_rows,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
      FROM revs r JOIN documents d ON d.doc_id % {_GC_REVS} <= r.rev_ix
      GROUP BY 1
    )
    SELECT r.rev_ix,
           CAST(CASE WHEN r.rev_ix IN {_GC_KEPT} THEN 1 ELSE 0 END AS INT) AS kept,
           CASE WHEN r.rev_ix IN {_GC_KEPT} THEN m.n_src_rows END AS n_src_rows,
           CASE WHEN r.rev_ix IN {_GC_KEPT} THEN m.n_docs END AS n_docs,
           CASE WHEN r.rev_ix IN {_GC_KEPT} THEN m.sum_chars END AS sum_chars,
           CAST({_GC_REVS - len(_GC_KEPT)} AS INT) AS n_deleted,
           CAST(1 AS INT) AS n_tmp_swept,
           CAST(1 AS INT) AS n_skipped_incomplete
    FROM revs r LEFT JOIN m ON m.rev_ix = r.rev_ix
    """,
    tags=("lakehouse", "maintenance", "retention", "index", "round12"),
)
def q_snapshot_gc_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot retention/GC certified end-to-end: build {_GC_REVS}
    deterministic revisions of a per-source census artifact (revision i
    covers doc_id % {_GC_REVS} <= i — nested, distinct contents), plus
    one stale builder temp dir and one incomplete published dir; run
    ``operators.retention.gc_snapshots`` (keep newest
    {_GC_KEEP_LATEST} + pin revision {_GC_PIN_REV} as the rollback
    target); then emit a census read from the SURVIVING parquet on
    disk. The oracle recomputes every kept revision's content from the
    documents table and the retention policy from first principles, so
    the driver's hash verdict proves the GC deleted exactly the
    unpinned old revisions, swept exactly the stale temp dir, skipped
    the incomplete dir, and left every survivor's bytes intact — a GC
    that deleted a live artifact or kept a doomed one flips the hash.

    Exactness: survivor metrics are exact integer counts/sums read
    back from parquet; policy outcomes are exact counters from the
    GcReport.

    Scale shape: GC itself is artifact-METADATA work — one directory
    listing + O(#revisions) stats and deletes, no parquet footer ever
    opened (see operators/retention.py); the census build is
    {_GC_REVS} bounded per-source rollups (source grain, ~tens of
    rows), and the certification reads survivor parquet at source
    grain. On a 100 TB deployment the same pass runs against an
    object-store prefix listing: cost scales with revision count,
    never corpus size.
    """
    import os
    import shutil
    import time as _time

    from ..operators.retention import gc_snapshots
    from ._util import publish_atomic, snapshot_dir, table_fingerprint

    # Per-PROCESS demo slate (ADVICE r12): the driver gate, bench passes,
    # and the pytest plan sweeps all build this query — concurrent
    # processes racing on ONE shared scratch tag could delete each
    # other's in-flight revisions or flip the hash. A pid-suffixed tag
    # isolates each invocation; within a process invocations are
    # sequential, and the wipe-on-entry below keeps the slate
    # deterministic across repeated runs in one process.
    gc_tag = f"{_GC_TAG}_pid{os.getpid()}"
    root = snapshot_dir(gc_tag, sf_dir)
    for name in os.listdir(root):
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    # ...and retire DEAD processes' demo slates (a GC demo must not
    # itself leak): sibling gc_demo_pid* tag dirs untouched for an hour
    # belong to exited drivers/benches/pytests — no live invocation
    # holds one that long, so this never races a concurrent builder.
    parent, mine = os.path.split(root)
    prefix = os.path.basename(root).split(f"pid{os.getpid()}")[0]
    cutoff = _time.time() - 3600
    for sib in os.listdir(parent):
        p = os.path.join(parent, sib)
        if (
            sib != mine
            and sib.startswith(prefix)
            and not os.path.islink(p)
            and os.path.isdir(p)
            and os.lstat(p).st_mtime < cutoff
        ):
            shutil.rmtree(p, ignore_errors=True)

    d = tables(spark, sf_dir)["documents"]
    fp = table_fingerprint(sf_dir, "documents")
    now = _time.time()
    paths = {}
    for i in range(_GC_REVS):
        art = d.filter(F.col("doc_id") % _GC_REVS <= i).groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        out = os.path.join(root, f"rev{i}_{fp}")
        publish_atomic(art, out, sort_cols=("source",))
        # pin recency order to revision order regardless of write timing
        os.utime(out, (now - 600 + i * 60, now - 600 + i * 60))
        paths[i] = out
    # a crashed builder's stale temp sibling (past the grace period)...
    stale_tmp = os.path.join(root, f"rev9_{fp}.tmp.99999")
    os.makedirs(stale_tmp)
    os.utime(stale_tmp, (now - 7200, now - 7200))
    # ...and an incomplete PUBLISHED dir (no _SUCCESS): anomaly, skipped
    incomplete = os.path.join(root, f"rev8_{fp}")
    os.makedirs(incomplete)

    report = gc_snapshots(
        gc_tag,
        sf_dir,
        keep_latest=_GC_KEEP_LATEST,
        keep_paths=(paths[_GC_PIN_REV],),
    )

    # Census from ACTUAL filesystem state: a kept revision is read back
    # from its surviving parquet; a deleted one contributes NULL metrics.
    per_rev = []
    for i in range(_GC_REVS):
        alive = os.path.exists(os.path.join(paths[i], "_SUCCESS"))
        if alive:
            row = (
                spark.read.parquet(paths[i])
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_src_rows"),
                    F.sum("n_docs").cast("bigint").alias("n_docs"),
                    F.sum("sum_chars").cast("bigint").alias("sum_chars"),
                )
                .select(
                    F.lit(i).cast("bigint").alias("rev_ix"),
                    F.lit(1).cast("int").alias("kept"),
                    "n_src_rows",
                    "n_docs",
                    "sum_chars",
                )
            )
        else:
            row = spark.range(1).select(
                F.lit(i).cast("bigint").alias("rev_ix"),
                F.lit(0).cast("int").alias("kept"),
                F.lit(None).cast("bigint").alias("n_src_rows"),
                F.lit(None).cast("bigint").alias("n_docs"),
                F.lit(None).cast("bigint").alias("sum_chars"),
            )
        per_rev.append(row)
    census = per_rev[0]
    for row in per_rev[1:]:
        census = census.unionByName(row)
    return census.select(
        "*",
        F.lit(len(report.deleted)).cast("int").alias("n_deleted"),
        F.lit(len(report.tmp_swept)).cast("int").alias("n_tmp_swept"),
        F.lit(len(report.skipped_incomplete)).cast("int").alias("n_skipped_incomplete"),
    )


# ---------------------------------------------------------------------------
# Stored BASE IVF index (corpus minus the delta slice) + incremental refresh
# ---------------------------------------------------------------------------

IVF_BASE_REV = f"r2k{K}"  # r2: members range-partitioned by centroid_id (prune layout)


def ivf_base_index_path(
    sf_dir: str,
    k: int = K,
    delta_mod: int = _DELTA_MOD,
    delta_rem: int = _DELTA_REM,
) -> str:
    import os

    from ._util import snapshot_dir, table_fingerprint

    # Catalog artifact keeps its r12 token; probe-built variants
    # (delta-proportional k, probe arrival slices — SCALE.md's prune
    # demonstration) get their own revision tokens so they never
    # collide with the certified artifact.
    rev = (
        IVF_BASE_REV
        if (k, delta_mod, delta_rem) == (K, _DELTA_MOD, _DELTA_REM)
        else f"r1k{k}d{delta_mod}r{delta_rem}"
    )
    return os.path.join(
        snapshot_dir("ivf_base", sf_dir),
        f"{rev}_{table_fingerprint(sf_dir, 'embeddings')}",
    )


def build_ivf_base_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    delta_mod: int = _DELTA_MOD,
    delta_rem: int = _DELTA_REM,
) -> str:
    """Persist the BASE IVF index: ``members`` = (vec_id, centroid_id,
    dist2, nrm) for every vector EXCLUDING the delta slice (vec_id %
    delta_mod == delta_rem; defaults to the repo's standing "newly
    arrived" convention), range-partitioned AND sorted by centroid_id so
    a touched-list read skips whole files and row groups via parquet
    min/max zone maps, plus ``centroids`` = the k frozen seed centroids
    (cid, cqv) — stored IN the artifact so a refresh assigns against the
    index's own centroids, never re-deriving them from the (possibly
    moved) corpus. Published atomically (temp parent + _SUCCESS + one
    os.rename), the round11n multi-part artifact contract.

    ``k`` defaults to the catalog's K; SCALE.md's prune demonstration
    builds delta-proportional variants (k up to hundreds of lists) under
    their own revision tokens.
    """
    import os
    import shutil

    e = _quantized(tables(spark, sf_dir)["embeddings"])
    cent = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cqv")
    )
    base = e.filter((F.col("vec_id") % delta_mod) != delta_rem)
    diff2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cqv"),
            lambda a, b: (a - b).cast("bigint") * (a - b).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    keyed = base.select("vec_id", "qv").crossJoin(F.broadcast(cent)).select(
        "vec_id", (diff2 * k + F.col("cid")).alias("key")
    )
    assign = keyed.groupBy("vec_id").agg(F.min("key").alias("key"))
    nrm = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("qv"), lambda a, b: a.cast("bigint") * b.cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    members = assign.join(base.select("vec_id", "qv"), "vec_id").select(
        "vec_id",
        (F.col("key") % k).cast("int").alias("centroid_id"),
        F.expr(f"key DIV {k}").cast("bigint").alias("dist2"),
        nrm.alias("nrm"),
    )
    out = ivf_base_index_path(sf_dir, k, delta_mod, delta_rem)
    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    # Range-partition on centroid_id BEFORE the within-partition sort:
    # without it every output file spans the whole centroid range (rows
    # arrive hash-distributed from the groupBy) and a touched-list read
    # can never skip a file — the zone-map prune the census depends on
    # needs each file to cover a narrow, disjoint centroid slice.
    members.repartitionByRange(
        max(8, min(k, 64)), "centroid_id"
    ).sortWithinPartitions("centroid_id", "vec_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "members"))
    cent.sortWithinPartitions("cid").write.mode("overwrite").parquet(
        os.path.join(tmp, "centroids")
    )
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def ivf_base_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    delta_mod: int = _DELTA_MOD,
    delta_rem: int = _DELTA_REM,
) -> dict[str, DataFrame]:
    """Stored base IVF index for the refresh probe: {members, centroids}
    frames reading the persisted artifact, building once if absent
    (self-healing, same contract as the other index artifacts)."""
    import os

    out = ivf_base_index_path(sf_dir, k, delta_mod, delta_rem)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        build_ivf_base_index(spark, sf_dir, k, delta_mod, delta_rem)
    return {
        "members": spark.read.parquet(os.path.join(out, "members")),
        "centroids": spark.read.parquet(os.path.join(out, "centroids")),
    }


@query(
    "q_knn_ivf_refresh",
    oracle=f"""
    WITH {_QUANT_SQL},
    {_ASSIGN_SQL},
    m AS (
      SELECT a.vec_id, a.centroid_id, a.dist2,
             CAST(list_dot_product(q.qv, q.qv) AS BIGINT) AS nrm
      FROM assign a JOIN q8 q USING (vec_id)
    ),
    touched AS (
      SELECT DISTINCT centroid_id FROM m
      WHERE vec_id % {_DELTA_MOD} = {_DELTA_REM}
    )
    SELECT m.centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN m.vec_id % {_DELTA_MOD} = {_DELTA_REM}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
           CAST(SUM(m.dist2) AS BIGINT) AS sum_dist2,
           CAST(SUM(m.nrm) AS BIGINT) AS sum_nrm
    FROM m JOIN touched USING (centroid_id)
    GROUP BY m.centroid_id
    """,
    tags=("similarity", "ivf", "ann", "index", "incremental", "llm-data", "round12"),
)
def q_knn_ivf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-index refresh — the ANN tier's missing fourth
    leg (build: ivf_base_index; serve: q_knn_ivf_stored; audit:
    q_ivf_serving_recall; refresh: THIS). The delta slice (vec_id %
    {_DELTA_MOD} == {_DELTA_REM}, ~10% "newly arrived" vectors) is
    quantized fresh and assigned to the STORED centroids read from the
    index artifact — never re-derived from the corpus — producing
    delta postings that append to the stored members. The emitted
    census covers exactly the TOUCHED inverted lists after the merge;
    the oracle derives the same census from a full rebuild over the
    whole corpus, so the driver's hash verdict proves append-refresh ==
    full rebuild on every list the refresh touches (untouched lists
    stream through byte-identical by construction — they are parquet
    rows the refresh never rewrites).

    Exactness: assignment uses the certified integer-L2 key encoding
    (dist2 * K + cid, ties to smaller cid); dist2 and nrm are exact
    BIGINTs; the census is integer counts/sums.

    Scale shape (100 TB): the corpus is scanned ONLY for the ~10%
    delta (partition-prunable on an arrival key in production);
    centroids are a K-row broadcast; the merged census reads ONLY the
    touched lists' member rows — the touched ids (bounded by K) come
    back to the driver and re-enter as an In() predicate on the
    centroid_id-range-partitioned, sorted members parquet, so the read
    is literally file/row-group-skipped (PushedFilters, pinned by the
    seam test), not a post-scan join filter. Refresh cost is
    O(delta x K + touched-list occupancy), decoupled from index size —
    the q_text_index_delta contract lifted to embedding space.
    SCALE.md's r13 probe demonstrates the prune at delta-proportional
    k (tools/probe_round12.py).
    """
    return ivf_refresh_census(spark, sf_dir)


def ivf_refresh_census(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    delta_mod: int = _DELTA_MOD,
    delta_rem: int = _DELTA_REM,
) -> DataFrame:
    """Parametric body of q_knn_ivf_refresh (the catalog query pins the
    defaults; the SCALE.md probe passes delta-proportional k and a
    small arrival slice to demonstrate the zone-map prune)."""
    idx = ivf_base_index(spark, sf_dir, k, delta_mod, delta_rem)
    # The K stored centroids collapse into ONE broadcast array row, so
    # assignment is a map-side argmin over the delta — zero shuffles on
    # the arrival slice (the seam test pins the census job at <= 2 keyed
    # exchanges; the touched-list distinct runs in the bounded
    # collect job below).
    cent_arr = idx["centroids"].agg(
        F.collect_list(F.struct(F.col("cid"), F.col("cqv"))).alias("cents")
    )
    delta = _quantized(
        tables(spark, sf_dir)["embeddings"].filter(
            (F.col("vec_id") % delta_mod) == delta_rem
        )
    )

    def _key(c):
        d2 = F.aggregate(
            F.zip_with(
                F.col("qv"),
                c["cqv"],
                lambda a, b: (a - b).cast("bigint") * (a - b).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return d2 * k + c["cid"].cast("bigint")

    nrm = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("qv"), lambda a, b: a.cast("bigint") * b.cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    delta_members = (
        delta.select("vec_id", "qv")
        .crossJoin(F.broadcast(cent_arr))
        .select(
            "vec_id",
            F.array_min(F.transform(F.col("cents"), _key)).alias("key"),
            nrm.alias("nrm"),
        )
        .select(
            "vec_id",
            (F.col("key") % k).cast("int").alias("centroid_id"),
            F.expr(f"key DIV {k}").cast("bigint").alias("dist2"),
            "nrm",
            F.lit(1).cast("int").alias("is_delta"),
        )
    )
    # Touched list ids to the driver — BOUNDED by k (<= a few hundred
    # even at delta-proportional k), the catalog's standard bounded-pull
    # shape — and back in as a LITERAL In() predicate: unlike the old
    # broadcast join, a literal predicate reaches the parquet scan as a
    # PushedFilter, so the range-partitioned, centroid-sorted members
    # artifact is read with file/row-group zone-map skipping. This is
    # the O(delta x occupancy) read the refresh contract claims; the
    # seam test pins the pushed filter.
    touched_ids = sorted(
        r["centroid_id"]
        for r in delta_members.select("centroid_id").distinct().collect()
    )
    merged = (
        idx["members"]
        .filter(F.col("centroid_id").isin(touched_ids))
        .select(
            "vec_id",
            "centroid_id",
            "dist2",
            "nrm",
            F.lit(0).cast("int").alias("is_delta"),
        )
        .unionByName(delta_members)
    )
    return merged.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("is_delta").cast("bigint").alias("n_delta"),
        F.sum("dist2").cast("bigint").alias("sum_dist2"),
        F.sum("nrm").cast("bigint").alias("sum_nrm"),
    )

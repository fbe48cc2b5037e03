"""Connected components over an edge list (small-diameter graphs).

Used to turn near-duplicate PAIRS (MinHash/LSH output) into duplicate
CLUSTERS: each component keeps one canonical document.

Algorithm: iterative min-label propagation — every node adopts the
smallest id reachable in one hop; repeat until fixpoint (or max_iter).
Each iteration is one shuffle (groupBy node). For dedup graphs the
diameter is tiny (chains of near-dups), so 5-10 iterations close almost
any real component; the iteration count is the explicit scale knob, and
convergence is detected via the monotone label-sum fingerprint (one
small aggregate per iteration — no join against the previous labels).

This is the standard large-scale approach (cf. connected components over
MapReduce / "hash-to-min"), not a driver-side union-find — no state ever
leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Returns (node, component) where component = min node id of the
    component (deterministic canonical label).

    ``edges`` is undirected input as (src, dst) pairs (any orientation).
    """
    # Materialize the edge list ONCE before anything fans out over it.
    # The symmetric closure below reads it 4 times, and Spark does not
    # dedupe common subtrees — without this, an expensive upstream (the
    # MinHash->LSH->Jaccard pipeline in the dedup flow) would re-execute
    # per branch. localCheckpoint also truncates the incoming lineage so
    # the iteration plans start from a materialized scan.
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)

    # symmetric closure + self-loops => neighborhood includes the node
    sym = (
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(e0.select("a", F.col("a").alias("b")))
        .union(e0.select(F.col("b").alias("a"), "b"))
        .distinct()
        .persist()  # read every iteration (join side) — compute once
    )
    labels = (
        sym.groupBy("a").agg(F.min("b").alias("comp")).withColumnRenamed("a", "node").persist()
    )

    # Iterative lineage discipline: each iteration's labels are persisted
    # (the changed-count action and the next join both read them — without
    # this every action recomputes the whole chain-so-far), the previous
    # generation is unpersisted, and the lineage is truncated with
    # localCheckpoint every few iterations so the plan stays O(1) instead
    # of growing per iteration (planner blowup / stack overflow on real
    # clusters at 10+ iterations).
    # Convergence check: labels only ever DECREASE (min-propagation is
    # monotone), so the label-sum is a strictly decreasing fingerprint
    # until fixpoint — one tiny aggregate per iteration on the already-
    # persisted frame, instead of a join-against-previous + count job.
    # decimal(38,0) so the sum can't overflow at cluster-scale node counts.
    def _fingerprint(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    fp = _fingerprint(labels)
    try:
        for i in range(max_iter):
            # propagate: node's new label = min(own label, neighbors' labels)
            neigh = sym.join(labels, sym.b == labels.node).select(
                F.col("a").alias("node"), F.col("comp")
            )
            new_labels = neigh.groupBy("node").agg(F.min("comp").alias("comp"))
            if (i + 1) % 5 == 0:
                new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.persist()
            new_fp = _fingerprint(new_labels)
            labels.unpersist()
            labels = new_labels
            if new_fp == fp:
                break
            fp = new_fp
    finally:
        sym.unpersist()
    return labels


def integer_pagerank(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list in fixed-point INTEGER
    arithmetic — bit-reproducible across engines and partitionings.

    Float PageRank sums contributions in nondeterministic partition
    order, so two runs (or two engines) disagree in the last ulps. This
    variant keeps every rank an integer: a node's contribution is
    ``(rank * damping_pct) DIV (100 * degree)`` (one floor division,
    computed identically everywhere), and the update is an integer SUM —
    associative and order-free — plus the constant teleport term
    ``(100 - damping_pct) * scale DIV 100``. The result is not classic
    PageRank to the last decimal (floor truncation loses < 1 unit per
    neighbor) but a deterministic fixed-point of the same recurrence,
    suitable for ranking and — the point here — for exact cross-engine
    verification of an ITERATIVE distributed computation.

    Each iteration is two shuffles (contribution groupBy target, rank
    join); lineage is truncated per iteration with localCheckpoint,
    the same discipline as connected_components above. At 100 TB the
    edge list is hash-partitioned by source and the rank vector by node
    id — the standard Pregel-style layout.
    """
    adj = (
        edges.select(F.col(u).alias("src"), F.col(v).alias("dst"))
        .union(edges.select(F.col(v).alias("src"), F.col(u).alias("dst")))
        .localCheckpoint(eager=False)
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # checkpointed: every iteration joins `nodes` (and the final ranks
    # derive from it) — without the barrier the degree groupBy re-runs
    # once per iteration per consumer
    nodes = deg.select(F.col("src").alias("id"), "deg").localCheckpoint(eager=False)
    teleport = (100 - damping_pct) * scale // 100
    ranks = nodes.select("id", "deg", F.lit(scale).cast("bigint").alias("rank"))
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["src"] == ranks["id"])
            .select(
                "dst",
                F.expr(f"(rank * {damping_pct}) DIV (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                "deg",
                (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks

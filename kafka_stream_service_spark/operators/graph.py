"""Connected components over an edge list (small-diameter graphs).

Used to turn near-duplicate PAIRS (MinHash/LSH output) into duplicate
CLUSTERS: each component keeps one canonical document.

Algorithm: iterative min-label propagation — every node adopts the
smallest id reachable in one hop; repeat until fixpoint (or max_iter).
Each iteration is one shuffle (groupBy node). For dedup graphs the
diameter is tiny (chains of near-dups), so 5-10 iterations close almost
any real component; the iteration count is the explicit scale knob, and
convergence is checked with a cheap changed-count aggregate.

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
    # symmetric closure + self-loops => neighborhood includes the node
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .union(
            edges.select(F.col(src).alias("a"), F.col(src).alias("b"))
            .union(edges.select(F.col(dst).alias("a"), F.col(dst).alias("b")))
        )
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
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels

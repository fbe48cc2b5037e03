"""Distributed exact global ranks / quantiles — the two-phase
range-partition algorithm the catalog's global-order operators
(q_calibration_bins, q_gini_concentration, skyline's aggregated series)
document as their at-scale replan. This module makes that replan REAL
code with its own oracle-checked query instead of a docstring promise.

Algorithm (classic distributed order statistics):

1. ``repartitionByRange(n, col, tiebreak)`` — one range exchange; the
   RangePartitioner samples boundaries, so partition p holds a
   contiguous slice of the global order.
2. Per-partition local ranks: a window partitioned BY PARTITION —
   parallel, no single-partition stage anywhere.
3. Partition row-counts (one tiny aggregate, |partitions| rows) are
   prefix-summed ON THE DRIVER (bounded by the partition count, not the
   data) and joined back as broadcast offsets.
4. global_rank = local_rank + offset[partition].

Exactness: the total order (col, tiebreak) makes ranks unique and
deterministic; quantile values at rank ceil(p*N) equal percentile_disc
by definition regardless of the tiebreak, because ranks of equal values
are consecutive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PARTITION_COL = "__range_pid"
RANK_COL = "__global_rank"
# Above this partition count, offsets attach via a broadcast join on the
# pid instead of a chained-when literal tree (deep when-nesting defeats
# whole-stage codegen at cluster-scale partition counts).
_OFFSET_WHEN_MAX = 32


def with_global_ranks(
    df: DataFrame,
    col: str,
    tiebreak: str,
    num_partitions: int = 8,
) -> DataFrame:
    """Returns ``df`` + ``__global_rank`` (1-based, dense over the total
    order (col, tiebreak)) computed without any single-partition window.
    """
    ranged = df.repartitionByRange(
        num_partitions, F.col(col), F.col(tiebreak)
    ).withColumn(PARTITION_COL, F.spark_partition_id())
    w = Window.partitionBy(PARTITION_COL).orderBy(col, tiebreak)
    # Materialize ONCE: the counts aggregate and the caller's downstream
    # job must see the SAME partitioning — re-executing the range
    # exchange per job lets AQE coalesce differently each time, which
    # desynchronizes spark_partition_id from the collected offsets
    # (observed: duplicate global ranks at sf0.01). localCheckpoint
    # pins pids + local ranks and truncates the lineage.
    local = ranged.withColumn(
        "__local_rank", F.row_number().over(w)
    ).localCheckpoint(eager=True)
    # |partitions| rows to the driver — bounded by the partition count
    counts = {
        r[PARTITION_COL]: r["n"]
        for r in local.groupBy(PARTITION_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if len(offsets) <= _OFFSET_WHEN_MAX:
        offset_col: Column = F.lit(0)
        # chained whens over a partition-count-sized literal map: pure
        # codegen, no join, no shuffle — the right shape while the
        # expression tree stays small
        for pid, off in offsets.items():
            offset_col = F.when(F.col(PARTITION_COL) == pid, F.lit(off)).otherwise(
                offset_col
            )
        return local.withColumn(
            RANK_COL, (F.col("__local_rank") + offset_col).cast("bigint")
        ).drop("__local_rank")
    # Cluster-scale partition counts: a chained-when tree with hundreds
    # of branches blows up codegen (deep expression nesting defeats
    # whole-stage compilation). Attach offsets as a broadcast hash join
    # on the partition id instead — |partitions| rows broadcast, still
    # no data-scale shuffle.
    spark = local.sparkSession
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        f"{PARTITION_COL} int, __offset bigint",
    )
    return (
        local.join(F.broadcast(off_df), PARTITION_COL)
        .withColumn(RANK_COL, (F.col("__local_rank") + F.col("__offset")).cast("bigint"))
        .drop("__local_rank", "__offset")
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    tiebreak: str,
    quantiles: list[float],
    num_partitions: int = 8,
) -> DataFrame:
    """percentile_disc for every p in ``quantiles``, computed via
    distributed ranks: value at global rank ceil(p * N). Returns
    (quantile_pct: bigint, value) rows."""
    ranked = with_global_ranks(df, col, tiebreak, num_partitions)
    n = ranked.count()
    targets = {max(1, -(-int(p * 100) * n // 100)): p for p in quantiles}
    if len(targets) != len(quantiles):
        # two quantiles landed on one rank — only possible when
        # n < 1/min-gap; callers at that size should sort locally
        raise ValueError(f"quantile ranks collide at n={n}: {sorted(quantiles)}")
    # rank r -> ceil(p*N) computed integer-side: ceil(a/b) = -(-a//b)
    hits = ranked.filter(F.col(RANK_COL).isin(list(targets)))
    mapping = F.lit(None).cast("bigint")
    for r, p in targets.items():
        mapping = F.when(F.col(RANK_COL) == r, F.lit(int(p * 100))).otherwise(mapping)
    return (
        hits.withColumn("quantile_pct", mapping)
        .filter(F.col("quantile_pct").isNotNull())
        .select("quantile_pct", F.col(col).alias("value"))
    )


NTILE_COL = "__global_ntile"


def with_global_ntile(
    df: DataFrame,
    k: int,
    col: str,
    tiebreak: str,
    num_partitions: int = 8,
) -> DataFrame:
    """Returns ``df`` + ``__global_ntile`` (1-based), bit-identical to
    ``ntile(k) OVER (ORDER BY col, tiebreak)`` but computed from the
    distributed global ranks — no single-partition window anywhere
    (round-12: the replan the ntile-family docstrings promised, made
    real; the catalog sweep in tests/test_single_partition_guard.py
    keeps the promise enforced).

    The SQL-standard tile split for N rows into k tiles: the first
    (N mod k) tiles hold ceil(N/k) rows, the rest floor(N/k). From a
    unique 1-based global rank r:

        q = N div k, r0 = N mod k, pivot = r0 * (q + 1)
        tile(r) = ceil(r / (q+1))                 for r <= pivot
                = r0 + ceil((r - pivot) / q)      otherwise

    (r > pivot implies q >= 1, so the otherwise-branch division is
    safe; integer ceil(a/b) = (a + b - 1) div b.) N attaches as a
    broadcast 1-row aggregate — the catalog's standard scalar shape.

    DESC orders: rank on the negated column (callers pass a prepared
    sort column); the tile arithmetic only sees ranks.
    """
    ranked = with_global_ranks(df, col, tiebreak, num_partitions)
    n_row = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(NTILE_COL, ntile_from_rank(k))
        .drop("__n")
    )


def ntile_from_rank(k: int) -> Column:
    """The rank -> tile expression (expects ``__global_rank`` and the
    broadcast-attached total count ``__n`` in scope) — exposed so a
    caller that already carries global ranks (e.g. for cume_dist =
    rank/N on a unique total order) derives its ntile from the SAME
    ranked pass instead of paying a second range exchange."""
    r = F.col(RANK_COL)
    q = F.expr(f"__n DIV {k}")
    r0 = F.col("__n") % k
    pivot = r0 * (q + 1)
    return (
        # ceil(r / (q+1)) and r0 + ceil((r - pivot) / q), all integer DIV
        F.when(r <= pivot, F.expr(f"({RANK_COL} + __n DIV {k}) DIV (__n DIV {k} + 1)"))
        .otherwise(
            r0
            + F.expr(
                f"({RANK_COL} - (__n % {k}) * (__n DIV {k} + 1) + __n DIV {k} - 1) "
                f"DIV (__n DIV {k})"
            )
        )
    ).cast("int")

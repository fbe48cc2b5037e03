"""As-of (backward) join.

Spark has no native as-of join (the reference pattern is pandas
``merge_asof``; SURVEY.md §2.2 "As-of / interval join"). The distributive
composition here:

1. tag both sides and union them (no join!),
2. one shuffle: partition by the equi-key, order by (time, right-first),
3. carry the most recent right-side row forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding frame,
4. keep left rows.

Cost at scale: exactly one shuffle on the key — same price as a plain
equi-join — versus the quadratic range cross-join a naive formulation
produces. Skewed keys behave like any window partition (AQE/salting apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) per ``on`` key.

    Returns all left columns plus ``{col}{suffix}`` for each of
    ``right_cols`` and ``{right_ts}{suffix}``.
    """
    rcols = list(right_cols)
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in rcols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{suffix}"),
        F.struct(*[c for c in left.columns]).alias("_left"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("_left"),
    )
    # at equal _ts, right sorts first unless strict (so "at-or-before"
    # includes it; strict excludes by sorting right after left)
    right_order = F.col("_is_right").desc() if not strict else F.col("_is_right").asc()
    w = (
        W.partitionBy(on)
        .orderBy("_ts", right_order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [
        F.last(F.when(F.col("_is_right") == 1, F.col(f"{c}{suffix}")), ignorenulls=True)
        .over(w)
        .alias(f"{c}{suffix}")
        for c in rcols + [right_ts]
    ]
    out = (
        l_tag.unionByName(r_tag)
        .select("_is_right", "_left", *carried)
        .filter(F.col("_is_right") == 0)
    )
    return out.select("_left.*", *[f"{c}{suffix}" for c in rcols + [right_ts]])

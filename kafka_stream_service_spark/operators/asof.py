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
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row per ``on`` key:
    ``direction="backward"`` (default) takes the latest right with
    ``right_ts <= left_ts`` (``<`` when ``strict``);
    ``direction="forward"`` takes the earliest right with
    ``right_ts >= left_ts`` (``>`` when ``strict``) — the same one-shuffle
    union-tag composition iterated in descending time order.

    ``tiebreak`` (a right column name) pins which right row wins among
    equal timestamps: largest wins backward, smallest wins forward —
    matching ``ORDER BY ts DESC, tb DESC LIMIT 1`` /
    ``ORDER BY ts ASC, tb ASC LIMIT 1`` respectively. Without it, equal
    timestamps resolve in partition order (fine for unique-ts data).

    ``tolerance`` (an SQL interval literal, e.g. ``"30 minutes"``) bounds
    match staleness — the feature-store TTL semantic (pandas
    ``merge_asof(tolerance=...)``): a nearest match farther than the
    tolerance from the left timestamp is nulled out instead of attached,
    so a stale feature never silently rides along. Applied as a map-side
    post-filter on the carried columns — zero extra shuffles.

    Returns all left columns plus ``{col}{suffix}`` for each of
    ``right_cols`` and ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    # at equal _ts, right sorts first unless strict (so the inclusive
    # bound sees it; strict excludes by sorting right after left).
    # forward = the same carry, iterated in DESCENDING time order.
    right_order = F.col("_is_right").desc() if not strict else F.col("_is_right").asc()
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    order = [ts_order, right_order]
    if tiebreak is not None:
        # last() carries the FINAL row among equals: backward wants the
        # largest tiebreak to land last (asc), forward the smallest (desc)
        tb = F.col(f"{tiebreak}{suffix}")
        order.append(tb.asc_nulls_first() if direction == "backward" else tb.desc_nulls_first())
    w = (
        W.partitionBy(on)
        .orderBy(*order)
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
    result = out.select("_left.*", *[f"{c}{suffix}" for c in rcols + [right_ts]])
    if tolerance is not None:
        rts = F.col(f"{right_ts}{suffix}")
        bound = F.expr(f"INTERVAL {tolerance}")
        within = (
            rts >= F.col(left_ts) - bound
            if direction == "backward"
            else rts <= F.col(left_ts) + bound
        )
        keep = rts.isNotNull() & within
        result = result.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in rcols + [right_ts]
            ],
        )
    return result

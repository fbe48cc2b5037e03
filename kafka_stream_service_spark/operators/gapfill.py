"""Time-series gap filling: dense bucket grid + LOCF / linear interpolation.

The hypertable pattern (reference family: the time-bucketed rollups in
queries/events_q.py): aggregate raw events to (key, bucket) cells, then
densify to one row per key per bucket between the observed bounds, and
fill the holes either by carrying the last observation forward (LOCF) or
by linear interpolation between the neighboring observations.

Spark-first shape:
- the grid is ``sequence(min, max, interval)`` exploded from a 1-row
  bounds aggregate, cross-joined (broadcast — it's bounds × keys, tiny
  by construction) against the distinct keys;
- the fill is pure window algebra: ``last(x, ignorenulls=True)`` over
  ``(-inf, 0]`` and ``first(x, ignorenulls=True)`` over ``[0, +inf)``
  per key ordered by bucket — one shuffle on the key, no Python.

At 100 TB the densified grid is |keys| x |buckets| rows — orders of
magnitude smaller than the raw events it summarizes; the only wide
operation is the per-key window sort, which AQE sizes per key group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_grid", "fill_locf", "fill_linear"]


def dense_grid(
    observed: DataFrame, ts_col: str, keys: list[str], step: str = "1 hour"
) -> DataFrame:
    """Densify (keys..., ts_col, values...) to one row per key per step
    between the global min/max bucket; missing cells carry null values."""
    bounds = observed.agg(F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx"))
    ticks = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr(f"interval {step}"))).alias(ts_col)
    )
    key_rows = observed.select(*keys).distinct()
    grid = key_rows.crossJoin(F.broadcast(ticks))
    return grid.join(observed, on=[*keys, ts_col], how="left")


def _w(keys: list[str], ts_col: str) -> tuple[Window, Window]:
    back = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return back, fwd


def fill_locf(grid: DataFrame, value_col: str, ts_col: str, keys: list[str]) -> DataFrame:
    """Last-observation-carried-forward; rows before the first observation
    stay null. Adds ``<value>_filled`` and an integer ``gap`` flag."""
    back, _ = _w(keys, ts_col)
    return grid.select(
        *keys,
        ts_col,
        F.last(value_col, ignorenulls=True).over(back).alias(f"{value_col}_filled"),
        F.col(value_col).isNull().cast("int").alias("gap"),
    )


def fill_linear(
    grid: DataFrame, value_col: str, ts_col: str, keys: list[str], round_to: int = 6
) -> DataFrame:
    """Linear interpolation for interior gaps; LOCF past the last
    observation, backfill before the first. Output rounded so the
    double division is compared on identical values engine-to-engine."""
    back, fwd = _w(keys, ts_col)
    v = F.col(value_col)
    t = F.col(ts_col).cast("timestamp")
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)
    frac = (F.unix_timestamp(t) - F.unix_timestamp(prev_t)) / (
        F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * frac)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return grid.select(
        *keys,
        ts_col,
        F.round(filled, round_to).alias(f"{value_col}_filled"),
        v.isNull().cast("int").alias("gap"),
    )

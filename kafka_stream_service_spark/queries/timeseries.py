"""Time-series densification queries: gap-filled hypertable rollups
(LOCF and linear interpolation) over the events table.

The reference's time-bucketed rollup family produces sparse (key, bucket)
cells; these queries add the TimescaleDB-style ``time_bucket_gapfill``
analogue — operators/gapfill.py builds the dense grid and fills holes
with pure window algebra (no Python, one shuffle per fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.gapfill import dense_grid, fill_linear, fill_locf
from ..tables import tables
from ._util import dec, dsum
from .registry import query

_HOURLY_CTE = """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM hourly),
    grid AS (
      SELECT k.event_type, g.bucket_ts
      FROM (SELECT DISTINCT event_type FROM hourly) k,
           (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts
            FROM bounds) g),
    j AS (
      SELECT g.event_type, g.bucket_ts, h.sum_value
      FROM grid g LEFT JOIN hourly h USING (event_type, bucket_ts))
"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(dsum(dec("value"), "sum_value"))


@query(
    "q_gapfill_locf",
    oracle=_HOURLY_CTE
    + """
    SELECT event_type, bucket_ts,
           last_value(sum_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS UNBOUNDED PRECEDING) AS sum_value_filled,
           CAST(sum_value IS NULL AS INT) AS gap
    FROM j
    """,
    tags=("timeseries", "gapfill", "window"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup with last-observation-carried-forward:
    every (event_type, hour) cell between the observed bounds exists in
    the output (the sf0.01 fixture has ~215 genuine holes), holes carry
    the previous hour's exact-decimal sum and are flagged. The grid is a
    broadcast bounds-sequence cross join; the fill is one per-key window
    pass — see operators/gapfill.py for the 100 TB shape."""
    g = dense_grid(_hourly(spark, sf_dir), "bucket_ts", ["event_type"], "1 hour")
    return fill_locf(g, "sum_value", "bucket_ts", ["event_type"])


@query(
    "q_gapfill_interpolate",
    oracle=_HOURLY_CTE
    + """
    , w AS (
      SELECT event_type, bucket_ts, sum_value,
             last_value(sum_value IGNORE NULLS) OVER back AS prev_v,
             last_value(CASE WHEN sum_value IS NOT NULL THEN bucket_ts END
                        IGNORE NULLS) OVER back AS prev_t,
             first_value(sum_value IGNORE NULLS) OVER fwd AS next_v,
             first_value(CASE WHEN sum_value IS NOT NULL THEN bucket_ts END
                         IGNORE NULLS) OVER fwd AS next_t
      FROM j
      WINDOW back AS (PARTITION BY event_type ORDER BY bucket_ts
                      ROWS UNBOUNDED PRECEDING),
             fwd AS (PARTITION BY event_type ORDER BY bucket_ts
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, bucket_ts,
           round(CASE
             WHEN sum_value IS NOT NULL THEN sum_value
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v) *
               (date_diff('second', prev_t, bucket_ts) /
                date_diff('second', prev_t, next_t))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v END, 6) AS sum_value_filled,
           CAST(sum_value IS NULL AS INT) AS gap
    FROM w
    """,
    tags=("timeseries", "gapfill", "window", "interpolate"),
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup with linear interpolation between the
    neighboring observations (LOCF past the tail, backfill before the
    head). Both engines compute the identical double expression
    prev + (next - prev) * (dt1 / dt2) on exact-decimal inputs and
    compare rounded to 6 — the fill fraction is the only inexact term."""
    g = dense_grid(_hourly(spark, sf_dir), "bucket_ts", ["event_type"], "1 hour")
    return fill_linear(g, "sum_value", "bucket_ts", ["event_type"])

"""Time-series densification queries: gap-filled hypertable rollups
(LOCF and linear interpolation) over the events table.

The reference's time-bucketed rollup family produces sparse (key, bucket)
cells; these queries add the TimescaleDB-style ``time_bucket_gapfill``
analogue — operators/gapfill.py builds the dense grid and fills holes
with pure window algebra (no Python, one shuffle per fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "q_ohlc_resample",
    oracle="""
    WITH ranked AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM events
    )
    SELECT event_type, bucket_ts,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_z = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM ranked
    GROUP BY event_type, bucket_ts
    """,
    tags=("timeseries", "resample", "ohlc", "window"),
)
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the financial/metrics resample primitive):
    per (series, hour) the opening value, high, low, closing value and
    tick count. Open/close are picked by deterministic (ts, event_id)
    rank — not first()/last(), whose result depends on partition
    arrival order — so the values are exact stored doubles and the
    oracle hash-matches without rounding. One shuffle for the window,
    reused by the aggregate (same partition key prefix).
    """
    from pyspark.sql import Window as W

    ev = tables(spark, sf_dir)["events"]
    b = F.date_trunc("hour", F.col("ts"))
    wa = W.partitionBy("event_type", "bucket_ts").orderBy("ts", "event_id")
    wz = W.partitionBy("event_type", "bucket_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = (
        ev.select("event_type", b.alias("bucket_ts"), "ts", "event_id", "value")
        .withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_z", F.row_number().over(wz))
    )
    return ranked.groupBy("event_type", "bucket_ts").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_z") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_conversion_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS name, COUNT(*) AS n_users FROM v
    UNION ALL SELECT 2, 'view>click', COUNT(*) FROM c
    UNION ALL SELECT 3, 'view>click>purchase', COUNT(*) FROM p
    """,
    tags=("events", "funnel", "analytics"),
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    advances a stage only with an event at-or-after their first event
    of the previous stage (the standard product-analytics semantics,
    all integer counts — hash-exact). Each stage is one groupBy over
    the filtered events joined to the prior stage's (small) user set,
    which broadcasts; the event table streams once per stage with the
    event_type filter pushed to the scan.
    """
    ev = tables(spark, sf_dir)["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df, num: int, name: str):
        return df.agg(
            F.lit(num).alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).alias("n_users"),
        ).select("stage", "name", "n_users")

    return (
        stage(v, 1, "view")
        .unionAll(stage(c, 2, "view>click"))
        .unionAll(stage(p, 3, "view>click>purchase"))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "analytics"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the product-analytics staple): users grouped by
    first-seen ISO week, counted per week-offset of later activity —
    the diagonal table every growth dashboard draws. Integer counts,
    Monday-truncated weeks in both engines, so the oracle hash-matches
    with no float anywhere.

    Two shuffles: the per-user first-seen aggregate (a small frame that
    broadcasts back into the activity join) and the final
    (cohort, offset) count-distinct.
    """
    ev = tables(spark, sf_dir)["events"]
    week = F.date_trunc("week", F.col("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("active_week")).distinct()
    offset = (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("int")
    return (
        active.join(F.broadcast(first_seen), "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "q_rolling_anomaly",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    w AS (
      SELECT *, count(c) OVER fr AS n_window, sum(c) OVER fr AS s, sum(c*c) OVER fr AS ss
      FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value, CAST(n_window AS BIGINT) AS n_window
    FROM w
    WHERE n_window >= 5 AND (n_window*c - s)*(n_window*c - s) > 9 * (n_window*ss - s*s)
    """,
    tags=("timeseries", "anomaly", "window"),
)
def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-sigma anomaly detection per user: flag an event whose
    value deviates from the mean of its previous <=10 events by more than
    3 population standard deviations.

    The test |x - mean| > 3*std is rearranged into pure INTEGER algebra
    over cents — (n*x - s)^2 > 9*(n*ss - s^2) — so the oracle matches
    bit-for-bit with no sqrt/float anywhere (the round-5 analogue of the
    funnel/OHLC exactness treatment). One shuffle (window partition by
    user_id); the trailing frame excludes the current row so a spike
    can't mask itself.
    """
    ev = tables(spark, sf_dir)["events"]
    c = F.round(F.col("value") * 100).cast("bigint")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = ev.select(
        "user_id", "event_id", "ts", "value", c.alias("c")
    ).select(
        "*",
        F.count("c").over(fr).alias("n_window"),
        F.sum("c").over(fr).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(fr).alias("ss"),
    )
    dev = F.col("n_window") * F.col("c") - F.col("s")
    var_n2 = F.col("n_window") * F.col("ss") - F.col("s") * F.col("s")
    return w.filter((F.col("n_window") >= 5) & (dev * dev > 9 * var_n2)).select(
        "user_id", "event_id", "ts", "value", F.col("n_window").cast("bigint").alias("n_window")
    )


@query(
    "q_ewma_smoothing",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, ts, c,
             list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
      FROM e
    )
    SELECT user_id, event_id, ts,
           CAST(list_sum(list_transform(range(1, len(l) + 1),
                                        i -> l[i] * (CAST(1 AS BIGINT) << (i - 1)))) AS BIGINT) AS ewma_num,
           (CAST(1 AS BIGINT) << len(l)) - 1 AS ewma_den,
           CAST(list_sum(list_transform(range(1, len(l) + 1),
                                        i -> l[i] * (CAST(1 AS BIGINT) << (i - 1)))) AS DOUBLE)
             / ((CAST(1 AS BIGINT) << len(l)) - 1) AS ewma_cents
    FROM w
    """,
    tags=("timeseries", "ewma", "window"),
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) over each
    user's last 16 values, computed EXACTLY: weights are powers of two,
    so the weighted sum is a bigint (numerator) over the geometric-series
    denominator 2^n - 1, and the only float op is one IEEE division both
    engines perform identically (numerator < 2^53, so the double cast is
    exact).

    Position-dependent weights can't ride a plain windowed SUM; the frame
    is collected (<=16 elements — bounded, unlike a full-partition
    collect) and reduced with an indexed transform. One shuffle.
    """
    ev = tables(spark, sf_dir)["events"]
    c = F.round(F.col("value") * 100).cast("bigint")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    w = ev.select("user_id", "event_id", "ts", c.alias("c")).select(
        "user_id",
        "event_id",
        "ts",
        F.collect_list("c").over(fr).alias("l"),
    )
    # shiftleft() takes a literal bit count, not a Column — 2^k via pow()
    # is exact in IEEE doubles for k <= 15 and round-trips the bigint cast
    num = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size("l")),
            lambda i: F.element_at(F.col("l"), i)
            * F.pow(F.lit(2.0), (i - 1).cast("double")).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    den = F.pow(F.lit(2.0), F.size("l").cast("double")).cast("bigint") - 1
    return w.select(
        "user_id",
        "event_id",
        "ts",
        num.alias("ewma_num"),
        den.alias("ewma_den"),
        (num.cast("double") / den).alias("ewma_cents"),
    )


_X0 = 1_704_067_200  # epoch seconds of 2024-01-01 (fixture window start)


@query(
    "q_groupwise_regression",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) - {_X0} AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY user_id
    )
    SELECT user_id, n,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
    FROM s
    """,
    tags=("timeseries", "regression", "analytics"),
)
def q_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time, kept EXACT
    by emitting the slope as an integer rational (numerator n*Sxy-Sx*Sy,
    denominator n*Sxx-Sx²) before the single final IEEE division — the
    closed-form normal equations, not an iterative fit. Two integer
    disciplines keep bigints in range and both engines identical:
    x is centered on the fixture window start (un-centered epoch²
    sums overflow int64 at ~700 points/user) — a shift that provably
    does not change the slope — and y is the 2-decimal value scaled to
    integer cents.

    Scale shape: the five sufficient statistics are one map-side
    combined agg (the same partial-merge algebra every distributed
    regression uses); slope math is per-group scalar arithmetic on the
    1-row-per-user result. One shuffle total, no iteration, no float
    accumulation anywhere.
    """
    e = tables(spark, sf_dir)["events"]
    pts = e.select(
        "user_id",
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 1000000") - F.lit(_X0)
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "user_id",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )


@query(
    "q_interval_sweepline",
    oracle="""
    WITH iv AS (
      SELECT CAST(o.o_orderdate AS DATE) AS sd,
             CAST(l.l_shipdate AS DATE) AS ed,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    ),
    ev AS (
      SELECT sd AS d, 1 AS delta, v AS vdelta FROM iv
      UNION ALL
      SELECT ed + 1, -1, -v FROM iv
    ),
    daily AS (
      SELECT d, SUM(delta) AS net_change, SUM(vdelta) AS net_value
      FROM ev GROUP BY d
    )
    SELECT CAST(d AS TIMESTAMP) AS d, CAST(net_change AS BIGINT) AS net_change,
           CAST(SUM(net_change) OVER w AS BIGINT) AS in_flight,
           CAST(SUM(net_value) OVER w AS DOUBLE) AS value_in_flight
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("timeseries", "interval", "window"),
)
def q_interval_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-concurrency via SWEEP-LINE: per calendar day, how many
    lineitems are in fulfillment (ordered but not yet shipped) and the
    exact order value in flight. The naive formulation joins every day
    against every overlapping interval — O(|days| x |items|); the
    sweep-line turns each interval into two signed delta events
    (+1/value at order date, -1/-value the day after shipment), folds
    them per day, and takes a running sum — the standard
    concurrent-sessions / resource-occupancy shape.

    Scale shape: the explode is exactly 2 rows per interval, map-side
    combined into per-day deltas BEFORE any window, so the
    single-partition running-sum window scans |distinct days| rows
    (thousands) — never |lineitem|. At second granularity over years,
    swap the final window for a two-level prefix sum (per-range partial
    totals broadcast back, same trick as q_pack_sequences' per-shard
    prefix) — the delta fold stays identical. DECIMAL deltas keep the
    running value exact under any summation order; negative-duration
    rows (synthetic fixture noise) are filtered on both sides.
    """
    t = tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_shipdate")
    o = t["orders"].select("o_orderkey", "o_orderdate")
    iv = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.to_date("o_orderdate").alias("sd"),
            F.to_date("l_shipdate").alias("ed"),
            dec("l_extendedprice").alias("v"),
        )
        .filter(F.col("ed") >= F.col("sd"))
    )
    ev = iv.select(F.col("sd").alias("d"), F.lit(1).alias("delta"), F.col("v").alias("vdelta")).unionAll(
        iv.select(F.date_add("ed", 1).alias("d"), F.lit(-1).alias("delta"), (-F.col("v")).alias("vdelta"))
    )
    daily = ev.groupBy("d").agg(
        F.sum("delta").alias("net_change"), F.sum("vdelta").alias("net_value")
    )
    w = (
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        F.col("d").cast("timestamp").alias("d"),
        F.col("net_change").cast("bigint").alias("net_change"),
        F.sum("net_change").over(w).cast("bigint").alias("in_flight"),
        F.sum("net_value").over(w).cast("double").alias("value_in_flight"),
    )


@query(
    "q_event_paths_topk",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type, 1) OVER w AS p1,
             LAG(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE p2 IS NOT NULL
    GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 20
    """,
    tags=("timeseries", "sequence", "window"),
)
def q_event_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream PATH MINING: the top-20 three-step behavior sequences
    (sliding trigram over each user's time-ordered event stream) with
    occurrence and distinct-user counts — the next structure up from
    the 1-step Markov matrix (q_event_transitions), and the raw input
    to funnel discovery (which paths actually precede purchase) as
    opposed to funnel MEASUREMENT of a hypothesized path
    (q_conversion_funnel). Ordering is the total (ts, event_id) order,
    so ties are deterministic across engines.

    Scale shape: one user-partitioned window shuffle carries two-deep
    lag state; paths pre-aggregate map-side before the count shuffle
    (path cardinality is |event_types|^3 — tiny); final top-20 is a
    TakeOrdered. No self-joins — the naive sequence-mining join
    (events x events x events on adjacency) never appears.
    """
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        s.select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(20)
    )


@query(
    "q_rfm_segmentation",
    oracle="""
    WITH p AS (
      SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
             SUM(CAST(value AS DECIMAL(12,2))) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    mx AS (SELECT MAX(ts) AS now_ts FROM events),
    rfm AS (
      SELECT user_id,
             CAST(date_diff('day', last_ts, (SELECT now_ts FROM mx)) AS BIGINT)
               AS recency_days,
             frequency, monetary,
             NTILE(5) OVER (ORDER BY last_ts DESC, user_id) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
      FROM p
    )
    SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
    FROM rfm
    """,
    tags=("timeseries", "analytics", "window"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic warehouse scoring query:
    per purchasing user, Recency (days since last purchase, against the
    corpus max timestamp so the query is reproducible), Frequency, and
    Monetary (exact DECIMAL), then quintile scores per dimension
    (deterministic ntile ties by user_id) composed into the 3-digit RFM
    segment code. 111 = best-everything, 555 = churned-low-value.

    Scale shape: one purchase aggregation shuffled on user_id, then
    three global ntile windows — acceptable because they run over the
    AGGREGATED per-user frame (|users|, not |events|), the same bounded
    single-partition trade the equi-depth histogram documents; at
    extreme user counts swap ntile for percentile-bound bucketing
    (two-pass, no global sort).
    """
    ev = tables(spark, sf_dir)["events"]
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec("value")).alias("monetary"),
        )
    )
    now_ts = ev.agg(F.max("ts").alias("now_ts"))
    wr = Window.orderBy(F.col("last_ts").desc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    wm = Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
    return (
        p.crossJoin(F.broadcast(now_ts))
        .select(
            "user_id",
            F.datediff(F.col("now_ts"), F.col("last_ts")).cast("bigint").alias("recency_days"),
            F.col("frequency").cast("bigint").alias("frequency"),
            F.col("monetary").cast("double").alias("monetary"),
            (
                F.ntile(5).over(wr) * 100 + F.ntile(5).over(wf) * 10 + F.ntile(5).over(wm)
            ).cast("bigint").alias("rfm"),
        )
    )

"""Event-time operators in batch form (SURVEY.md §2.2 "Streaming-only").

Each query here is the *batch-expressible* form of a streaming operator
(tumbling/sliding/session windows, dedup, as-of join) run over the
``events`` fixture; the genuinely streaming execution of the same logical
ops (watermarks, triggers, state) lives in
``kafka_stream_service_spark.streaming`` and is exercised by
``tests/test_streaming.py`` with chunked file replay.

At scale: ``F.window`` aggregation is a single shuffle on (window, keys);
session windows shuffle on user_id; the as-of join is the
union-tag + conditional-last composition which costs one shuffle on
(user_id) rather than a range cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec, dsum
from .registry import query


@query(
    "q_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window-agg"),
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (batch form of the
    streaming groupBy(window(ts, '1 hour')))."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(dec("value"), "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH base AS (
      SELECT *, make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS slot
      FROM events
    ), expanded AS (
      SELECT event_type, value, slot AS window_start FROM base
      UNION ALL
      SELECT event_type, value, slot - INTERVAL 30 MINUTE AS window_start FROM base
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM expanded
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window-agg"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour size, 30 min slide): each event lands in two
    windows; Spark's window() expansion vs the oracle's explicit union."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(dec("value"), "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("streaming", "session-window"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user via F.session_window — the same
    operator Structured Streaming uses for stateful sessionization."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(dec("value"), "sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_event_dedup",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id, MIN(ts) AS first_ts
    FROM events
    GROUP BY user_id, event_type
    """,
    tags=("streaming", "dedup"),
)
def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest record — the deterministic batch
    equivalent of streaming dropDuplicates on (user_id, event_type)."""
    e = tables(spark, sf_dir)["events"]
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.min("ts").alias("first_ts")
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) c ON TRUE
    """,
    tags=("streaming", "asof-join"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each purchase, the latest click at-or-before
    it for the same user.

    Spark has no native as-of join; this is the scalable union-tag
    composition: tag both sides, union, sort per user by time within one
    shuffle, carry the last click forward with a running `last(...,
    ignorenulls)` window, keep purchase rows. One shuffle on user_id — no
    range cross-join blowup (reference pattern: pd.merge_asof, generalized
    distributively).
    """
    from ..operators import asof_join

    e = tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=("click_id",),
        suffix="",
    )
    return joined.select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


@query(
    "q_event_type_rates",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "agg"),
)
def q_event_type_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type profile (the batch form of a streaming KPI aggregate)."""
    e = tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(dec("value"), "sum_value"),
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


_MULTIGRAIN_SQL = """
    WITH base AS (
      SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
             event_type, CAST(value AS DECIMAL(12,2)) AS v
      FROM events
    )
    SELECT d AS day_start, h AS hour_start,
           CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM base
    GROUP BY GROUPING SETS ((d, h, event_type), (d, event_type))
"""


@query(
    "q_time_rollup_multigrain",
    oracle=_MULTIGRAIN_SQL,
    tags=("streaming", "rollup", "hypertable"),
)
def q_time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour AND day grains
    of the event stream in ONE pass via GROUPING SETS (Spark plans a
    single scan + Expand + one shuffle — no second read of the fact
    table for the coarser grain).

    At 100 TB this is the materialization query behind multi-resolution
    dashboards: partial aggregation runs map-side per grain, and adding
    grains (week/month) extends the Expand, not the scan count.
    """
    tables(spark, sf_dir)["events"].createOrReplaceTempView("events")
    return spark.sql(_MULTIGRAIN_SQL)


@query(
    "q_asof_join_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) c ON TRUE
    """,
    tags=("streaming", "asof-join", "feature-store"),
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with STALENESS TOLERANCE — the feature-store TTL
    semantic (pandas merge_asof(tolerance=...)): each purchase attaches
    the latest same-user click at-or-before it ONLY if that click is at
    most 30 minutes old; a staler nearest click yields NULL instead of a
    silently-stale feature. Differs from the plain as-of
    (q_asof_join: any age) and from the interval join (all matches in
    range, not nearest-1) — the three shapes of temporal attachment.

    Scale shape: identical to the plain as-of — one union-tag shuffle on
    the key, running last() carry — plus a map-side tolerance nulling;
    the TTL adds ZERO shuffles, vs the naive banded-join formulation
    which would shuffle both sides into time bands.
    """
    from ..operators import asof_join

    e = tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=("click_id",),
        suffix="",
        tolerance="30 minutes",
    )
    return joined.select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


@query(
    "q_session_window_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_type,
             ts + CASE WHEN event_type = 'error' THEN INTERVAL 60 MINUTE
                       ELSE INTERVAL 30 MINUTE END AS e_end
      FROM events
    ),
    m AS (
      SELECT user_id, ts, e_end,
             MAX(e_end) OVER (PARTITION BY user_id ORDER BY ts, e_end
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM e
    ),
    s AS (
      SELECT *, CASE WHEN prev_max IS NULL OR ts >= prev_max THEN 1 ELSE 0 END
                  AS is_new
      FROM m
    ),
    g AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, e_end
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(e_end) AS session_end,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id, sid
    """,
    tags=("streaming", "session-window", "dynamic-gap"),
)
def q_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows: the inactivity gap is an expression
    of the row (60 min after an 'error', 30 min otherwise), so a session
    is the union of per-event intervals [ts, ts+gap) — error events hold
    sessions open longer, the incident-tracking shape. This is the
    F.session_window(gap_expr) surface on top of the fixed-gap
    q_session_window.

    The oracle is the general interval-union form (running max of
    interval ends, NEW session iff ts >= every previous end): with
    per-row gaps the fixed-gap lag test is WRONG — a long-gap event can
    bridge across a short-gap successor — so the oracle states the
    merge semantics Spark implements, half-open boundary included
    (ts == prev end starts a new session).

    Scale shape: identical to fixed-gap sessionization — one shuffle on
    the session key, per-key ordered merge; in streaming the same
    expression drives watermarked stateful sessionization.
    """
    e = tables(spark, sf_dir)["events"]
    gap = F.when(F.col("event_type") == "error", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )

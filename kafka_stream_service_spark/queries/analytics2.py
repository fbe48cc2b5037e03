"""Robust-statistics / BI analytics operators, round 6 extension:
Pareto (skyline) frontier, median-absolute-deviation outlier audit,
integer-exact lag-k autocorrelation, period-over-period growth, and
last-touch marketing attribution.

All five follow the catalog's exactness rules (SURVEY.md §7): money
through DECIMAL, ratios either as IEEE-deterministic double pipelines
(every input exactly representable) or as floor()-scaled integers, dates
surfaced as TIMESTAMP on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec
from .registry import query


# ---------------------------------------------------------------------------
# Pareto / skyline frontier
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
    WITH pts AS (
      SELECT p_partkey,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
             p_size
      FROM part
    )
    SELECT p.p_partkey, p.price_cents, CAST(p.p_size AS INT) AS p_size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
        AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
    )
"""


@query(
    "q_skyline_pareto",
    oracle=_SKYLINE_ORACLE,
    tags=("analytics", "skyline"),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of parts: minimize retail price,
    maximize size — a part survives iff no other part is at most as
    expensive AND at least as large with one strict inequality.

    Scale shape: NOT the oracle's all-pairs NOT EXISTS. The frontier of
    a min/max 2-D skyline depends only on the per-price maximum size, so
    we (1) groupBy price -> max(size) — one map-side-combinable shuffle
    that collapses the problem from |rows| to |distinct prices| (TPC-H
    prices live in a bounded range, so this series stays small at any
    SF); (2) one window pass over the aggregated series: a price is on
    the frontier iff its max size strictly exceeds the running max over
    all cheaper prices; (3) broadcast the frontier (price, size) pairs
    back onto the base table to emit the surviving part rows. The only
    global-order window runs on the aggregated series, never on the base
    data.
    """
    part = tables(spark, sf_dir)["part"]
    pts = part.select(
        "p_partkey",
        (dec("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    per_price = pts.groupBy("price_cents").agg(F.max("p_size").alias("max_size"))
    w_prev = (
        Window.orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_price.withColumn("run_max", F.max("max_size").over(w_prev))
        .filter(F.col("run_max").isNull() | (F.col("max_size") > F.col("run_max")))
        .select("price_cents", F.col("max_size").alias("p_size"))
    )
    return pts.join(F.broadcast(frontier), ["price_cents", "p_size"], "inner").select(
        "p_partkey", "price_cents", "p_size"
    )


# ---------------------------------------------------------------------------
# Median-absolute-deviation outlier audit
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
    WITH v AS (
      SELECT event_type, CAST(value AS DECIMAL(10,2)) AS v FROM events
    ),
    med AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.v, med.med, abs(v.v - med.med) AS d
      FROM v JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           COUNT(*) AS n,
           CAST(any_value(dev.med) AS DOUBLE) AS med,
           CAST(any_value(mad.mad) AS DOUBLE) AS mad,
           CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
"""


@query(
    "q_mad_outliers",
    oracle=_MAD_ORACLE,
    tags=("analytics", "robust-stats", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: median / median-absolute-
    deviation (the robust z-score), flagging |v - med| > 3*MAD. Unlike
    mean/stddev (q_rolling_anomaly), the MAD breaks down only at 50%
    contamination — the estimator a data-quality audit actually wants.

    Exactness: percentile_disc picks real data values (2-dp DECIMAL), so
    med, MAD, deviations, and the 3*MAD comparison are all exact decimal
    arithmetic — no interpolation, no float summation.

    Scale shape (r14 replan): both medians come from the distributed
    ranked-histogram operator (operators/ranks.group_exact_percentiles
    — no reducer ever buffers a group's values; the 2-dp value
    histogram is at most ~10^4 rows per type at any corpus size), plus
    two BROADCAST joins of the |event_type|-row med/MAD frames back
    onto the stream — the base table shuffles once per percentile pass,
    never for the joins.
    """
    from ..operators.ranks import group_exact_percentiles

    ev = tables(spark, sf_dir)["events"]
    v = ev.select("event_type", dec("value", 10, 2).alias("v"))
    # r14 replan: both medians come from the distributed ranked-histogram
    # operator instead of the per-group-buffering percentile_disc
    # aggregate (see group_exact_percentiles). The picked value is a
    # real 2-dp data element, so the double->DECIMAL cast is exact and
    # keeps the deviation arithmetic decimal on both engines.
    med = group_exact_percentiles(v, "event_type", "v", disc=(0.5,)).select(
        "event_type", F.col("disc_5").cast("decimal(10,2)").alias("med")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    mad = group_exact_percentiles(
        dev.select("event_type", "d"), "event_type", "d", disc=(0.5,)
    ).select("event_type", F.col("disc_5").cast("decimal(11,2)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value("med").cast("double").alias("med"),
            F.any_value("mad").cast("double").alias("mad"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Lag-k autocorrelation, integer-exact
# ---------------------------------------------------------------------------

# ACF_k = sum_{t>k} (x_t - mu)(x_{t-k} - mu) / sum_t (x_t - mu)^2 with
# mu = S/n. Multiplying both sides by n^2 clears the rational mean:
# n^2*num_k = sum (n*x_t - S)(n*x_{t-k} - S), all integer in cents.
# DuckDB runs the products in HUGEINT (int128), Spark in DECIMAL(38,0);
# both are exact for these magnitudes (|dev| <~ 1e15 cents at SF100, so
# products <~ 1e30 << 1e38). The final ratio is emitted as
# floor(num*1e6/den) computed in DOUBLE — every double op is IEEE-
# deterministic, so both engines produce the identical bigint.
_ACF_ORACLE = """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate
    ),
    stats AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM daily),
    devs AS (
      SELECT CAST(stats.n * daily.x - stats.s AS HUGEINT) AS dev,
             ROW_NUMBER() OVER (ORDER BY daily.d) AS t
      FROM daily, stats
    ),
    lagged AS (
      SELECT dev,
             lag(dev, 1) OVER (ORDER BY t) AS dev1,
             lag(dev, 7) OVER (ORDER BY t) AS dev7
      FROM devs
    ),
    sums AS (
      SELECT SUM(dev * dev) AS den,
             SUM(dev * dev1) AS num1,
             SUM(dev * dev7) AS num7
      FROM lagged
    )
    SELECT (SELECT n FROM stats) AS n,
           CAST(FLOOR(CAST(num1 AS DOUBLE) * 1000000 / CAST(den AS DOUBLE))
                AS BIGINT) AS acf1_ppm,
           CAST(FLOOR(CAST(num7 AS DOUBLE) * 1000000 / CAST(den AS DOUBLE))
                AS BIGINT) AS acf7_ppm
    FROM sums
"""


@query(
    "q_autocorr_lag",
    oracle=_ACF_ORACLE,
    tags=("analytics", "timeseries"),
)
def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily order-revenue series,
    integer-exact: the rational mean is cleared by the n^2 scaling trick
    (dev_t = n*x_t - S in cents, a bigint), products and sums run in
    DECIMAL(38,0) (DuckDB: HUGEINT), and the ratio is emitted in ppm via
    a pure-double floor pipeline — deterministic on both engines because
    every double input is the image of the same exact integer.

    Scale shape: the base table collapses to one row per day in a single
    map-side-combinable aggregation; the windowed lag pass runs on that
    aggregated series (|days|, thousands of rows at any SF — bounded by
    the calendar, not the data), so the global-order window is safe. A
    1-row stats frame joins by broadcast (literal cross join of one row).
    """
    orders = tables(spark, sf_dir)["orders"]
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec("o_totalprice") * 100).cast("bigint").alias("x")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    devs = daily.crossJoin(F.broadcast(stats)).select(
        (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)").alias("dev"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
        "n",
    )
    w = Window.orderBy("t")
    lagged = devs.select(
        "n",
        "dev",
        F.lag("dev", 1).over(w).alias("dev1"),
        F.lag("dev", 7).over(w).alias("dev7"),
    )
    sums = lagged.groupBy("n").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        F.sum(F.col("dev") * F.col("dev1")).alias("num1"),
        F.sum(F.col("dev") * F.col("dev7")).alias("num7"),
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n"),
        F.floor(
            F.col("num1").cast("double") * 1000000 / F.col("den").cast("double")
        )
        .cast("bigint")
        .alias("acf1_ppm"),
        F.floor(
            F.col("num7").cast("double") * 1000000 / F.col("den").cast("double")
        )
        .cast("bigint")
        .alias("acf7_ppm"),
    )


# ---------------------------------------------------------------------------
# Period-over-period growth
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT m, rev, lag(rev) OVER (ORDER BY m) AS prev
      FROM monthly
    )
    SELECT CAST(m AS TIMESTAMP) AS month_ts,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - prev AS DOUBLE) AS delta,
           CASE WHEN prev IS NULL THEN NULL
                ELSE CAST(FLOOR(CAST(rev - prev AS DOUBLE) * 10000
                                / CAST(prev AS DOUBLE)) AS BIGINT)
           END AS growth_bp
    FROM g
"""


@query(
    "q_mom_growth",
    oracle=_MOM_ORACLE,
    tags=("analytics", "timeseries", "bi"),
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly totals (exact DECIMAL),
    lag-1 delta, and growth in basis points via the floor-of-double
    pipeline (inputs are exact 2-dp decimals whose doubles round
    identically on both engines).

    Scale shape: one map-side-combinable aggregation collapses orders to
    |months| rows (bounded by the calendar); the lag window runs on that
    aggregated series only.
    """
    orders = tables(spark, sf_dir)["orders"]
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    g = monthly.withColumn("prev", F.lag("rev").over(Window.orderBy("m")))
    return g.select(
        F.col("m").cast("timestamp").alias("month_ts"),
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.col("prev")).cast("double").alias("delta"),
        F.when(F.col("prev").isNull(), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                (F.col("rev") - F.col("prev")).cast("double")
                * 10000
                / F.col("prev").cast("double")
            ).cast("bigint")
        )
        .alias("growth_bp"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

_ATTRIB_ORACLE = """
    WITH touched AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS conversions,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
"""


@query(
    "q_attribution_last_touch",
    oracle=_ATTRIB_ORACLE,
    tags=("analytics", "events", "bi"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent preceding non-purchase event type (the
    'channel'), 'direct' when the purchase is the user's first event.
    The credited value is the purchase amount in exact DECIMAL.

    Spark shape: the ignore-nulls last_value window with a rows frame —
    the same LOCF idiom as fill_locf (timeseries.py) — over
    (user, ts, event_id) order; then a channel roll-up. One shuffle on
    user_id for the window, one map-side-combinable aggregation on the
    ~|event_type| channels. The window partitions by user, so it scales
    horizontally — no global order anywhere.
    """
    ev = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(dec("value", 10, 2)).cast("double").alias("attributed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)
# ---------------------------------------------------------------------------

_TWAP_ORACLE = """
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v_c,
             event_id
      FROM events
    ),
    d AS (
      SELECT event_type, v_c,
             lead(t_us) OVER (PARTITION BY event_type ORDER BY t_us, event_id)
               - t_us AS dt_us
      FROM e
    )
    SELECT event_type,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS total_dt_us,
           CAST(FLOOR(CAST(SUM(v_c * dt_us) AS DOUBLE) * 10000 / SUM(dt_us))
                AS BIGINT) AS twap_micro
    FROM d WHERE dt_us IS NOT NULL
    GROUP BY event_type
"""


@query(
    "q_time_weighted_average",
    oracle=_TWAP_ORACLE,
    tags=("analytics", "timeseries", "twap"),
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per event type: each
    observation is weighted by how long it remained current (microsecond
    gap to the next event of the same type) — the estimator that is
    correct under irregular sampling, where the plain mean over-weights
    bursts. All arithmetic is integer (cents x micros, ~1e17 max, well
    inside bigint); the final ratio is the floor-of-double pipeline.

    Scale shape: one shuffle on event_type for the lead window
    (horizontal — partitioned by the key), then a map-side-combinable
    aggregation. The same construction with a date-bucketed key yields
    per-day TWAP without any new machinery.
    """
    ev = tables(spark, sf_dir)["events"]
    e = ev.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        (dec("value", 10, 2) * 100).cast("bigint").alias("v_c"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    d = e.select(
        "event_type",
        "v_c",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").cast("bigint").alias("total_dt_us"),
        F.floor(
            F.sum(F.col("v_c") * F.col("dt_us")).cast("double")
            * 10000
            / F.sum("dt_us")
        )
        .cast("bigint")
        .alias("twap_micro"),
    )


# ---------------------------------------------------------------------------
# Source-vocabulary overlap matrix
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
    WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
    toks AS (
      SELECT source, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS tok
      FROM t, unnest(range(1, len(w))) AS u(i)
    ),
    vocab AS (SELECT DISTINCT source, tok FROM toks WHERE length(tok) >= 3),
    sizes AS (SELECT source, COUNT(*) AS sz FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(FLOOR(CAST(n_common AS DOUBLE) * 1000000
                      / (sa.sz + sb.sz - n_common)) AS BIGINT) AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.source = inter.src_a
    JOIN sizes sb ON sb.source = inter.src_b
"""


@query(
    "q_source_overlap_matrix",
    oracle=_OVERLAP_ORACLE,
    tags=("analytics", "dedup", "corpus", "llm-data"),
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET-level dedup signal: pairwise bigram-vocabulary Jaccard
    between sources — the audit that flags two crawl dumps as largely
    the same corpus before any document-level dedup runs (the doc-level
    MinHash family answers a different question). Intersections come
    from a token-keyed equi-join of the per-source vocabularies — pairs
    are generated ONLY where a shared token exists, never source x
    source.

    Scale shape: vocabulary dedup is map-side-combinable; the
    intersection join shuffles on the token (its natural key) and the
    pair aggregation is bounded by |sources|^2 cells; the sizes frame is
    |sources| rows, broadcast. Hot boilerplate tokens fan out at most
    |sources| per token.
    """
    d = tables(spark, sf_dir)["documents"]
    w = d.select("source", F.split("text", " ").alias("w"))
    toks = w.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"
            )
        ).alias("tok"),
    ).filter(F.length("tok") >= 3)
    vocab = toks.distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sa"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.floor(
                F.col("n_common").cast("double")
                * 1000000
                / (F.col("sa") + F.col("sb") - F.col("n_common"))
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )

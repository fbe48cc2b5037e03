"""Round-11 batch 16: variance-homogeneity (Brown-Forsythe) and lag-1
Granger causality — the two remaining named diagnostics of the
hypothesis-testing and time-series tiers, both reduced to exact-integer
censuses with single quantized emissions.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; both rows extend the mandated monitoring/experiment
tier with exact-arithmetic driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Brown-Forsythe test (ANOVA on |x - group median|) across return flags
# ---------------------------------------------------------------------------


@query(
    "q_brown_forsythe",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS val
      FROM lineitem
    ),
    cell AS (
      SELECT grp, val, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY grp, val
    ),
    cum AS (
      SELECT grp, val, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf,
             SUM(c) OVER (PARTITION BY grp) AS n_g
      FROM cell
    ),
    med AS (
      SELECT grp,
             CAST(MIN(CASE WHEN 2 * cf >= n_g THEN val END)
                + MIN(CASE WHEN 2 * cf >= n_g + 1 THEN val END) AS BIGINT)
               AS med2
      FROM cum GROUP BY grp
    ),
    dd AS (
      SELECT c.grp, c.c, ABS(2 * c.val - m.med2) AS d2
      FROM cell c JOIN med m ON m.grp = c.grp
    ),
    g AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS n_i,
             CAST(SUM(c * d2) AS BIGINT) AS t_i,
             CAST(SUM(c * d2 * d2) AS BIGINT) AS q_i
      FROM dd GROUP BY grp
    ),
    gq AS (
      SELECT grp, n_i, t_i, q_i,
             CAST(FLOOR(1000000.0 * CAST(t_i AS DOUBLE) * t_i / n_i) AS BIGINT)
               AS tt_q6
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(t_i) AS BIGINT) AS t, CAST(SUM(q_i) AS BIGINT) AS q,
             CAST(SUM(tt_q6) AS BIGINT) AS stt_q6
      FROM gq
    )
    SELECT g.grp, g.n_i, g.t_i, t.n, t.k,
           CAST(FLOOR(1000000.0
             * ((CAST(t.stt_q6 AS DOUBLE) / 1000000.0
                 - CAST(t.t AS DOUBLE) * t.t / t.n) / (t.k - 1))
             / NULLIF((CAST(t.q AS DOUBLE)
                 - CAST(t.stt_q6 AS DOUBLE) / 1000000.0) / (t.n - t.k), 0.0))
             AS BIGINT) AS f_q6
    FROM gq g CROSS JOIN tot t
    """,
    tags=("stats", "hypothesis-test", "variance", "round11"),
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test for variance homogeneity of quantities
    across the three return flags: one-way ANOVA on the absolute
    deviations from each GROUP MEDIAN — the robust Levene variant that
    anova/t-tests silently assume away (equal spread), and the
    diagnostic to run before trusting q_anova_oneway's F. Deviations
    are doubled (|2x - (med_lo + med_hi)|) so even-count medians stay
    integers.

    Exactness: group medians come exactly from the bounded value
    census (cumulative counts over <= 50 cells per group); T_i, Q_i
    are exact integer sums of doubled deviations; the cross-group
    sum of T_i^2/n_i quantizes each group term to micro units BEFORE
    summation (the chi-square recipe), and F is one quantized double
    tree with a NULLIF-guarded denominator.

    Scale shape: one map-side-combinable (group x value) census —
    everything after runs on <= 150 cells; no data-scale windows, no
    second pass for the medians.
    """
    li = tables(spark, sf_dir)["lineitem"]
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("val"),
    )
    cell = v.groupBy("grp", "val").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cell = cell.cache()
    wcf = Window.partitionBy("grp").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wg = Window.partitionBy("grp")
    cum = cell.select(
        "grp",
        "val",
        "c",
        F.sum("c").over(wcf).alias("cf"),
        F.sum("c").over(wg).alias("n_g"),
    )
    med = cum.groupBy("grp").agg(
        (
            F.min(F.when(2 * F.col("cf") >= F.col("n_g"), F.col("val")))
            + F.min(F.when(2 * F.col("cf") >= F.col("n_g") + 1, F.col("val")))
        )
        .cast("bigint")
        .alias("med2")
    )
    dd = cell.join(F.broadcast(med), "grp").select(
        "grp", "c", F.abs(2 * F.col("val") - F.col("med2")).alias("d2")
    )
    g = dd.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_i"),
        F.sum(F.col("c") * F.col("d2")).cast("bigint").alias("t_i"),
        F.sum(F.col("c") * F.col("d2") * F.col("d2")).cast("bigint").alias("q_i"),
    )
    gq = g.select(
        "grp",
        "n_i",
        "t_i",
        "q_i",
        F.floor(
            F.lit(1000000.0) * F.col("t_i").cast("double") * F.col("t_i") / F.col("n_i")
        )
        .cast("bigint")
        .alias("tt_q6"),
    )
    tot = gq.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("t_i").cast("bigint").alias("t"),
        F.sum("q_i").cast("bigint").alias("q"),
        F.sum("tt_q6").cast("bigint").alias("stt_q6"),
    )
    return gq.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_i",
        "t_i",
        "n",
        "k",
        F.floor(
            F.lit(1000000.0)
            * (
                (
                    F.col("stt_q6").cast("double") / F.lit(1000000.0)
                    - F.col("t").cast("double") * F.col("t") / F.col("n")
                )
                / (F.col("k") - 1)
            )
            / F.nullif(
                (
                    F.col("q").cast("double")
                    - F.col("stt_q6").cast("double") / F.lit(1000000.0)
                )
                / (F.col("n") - F.col("k")),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("f_q6"),
    )


# ---------------------------------------------------------------------------
# Lag-1 Granger causality: does event VOLUME lead revenue?
# ---------------------------------------------------------------------------


@query(
    "q_granger_lag1",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_ev
      FROM events GROUP BY 1
    ),
    obs AS (
      SELECT a.d, a.cents AS y, b.cents AS w, b.n_ev AS x
      FROM daily a JOIN daily b ON b.d = a.d - 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(x) AS BIGINT) AS sx
      FROM obs
    ),
    e AS (
      SELECT CAST(o.y * m.n - m.sy AS BIGINT) AS ey,
             CAST(o.w * m.n - m.sw AS BIGINT) AS ew,
             CAST(o.x * m.n - m.sx AS BIGINT) AS ex
      FROM obs o CROSS JOIN m
    ),
    s AS (
      SELECT CAST(SUM(ey * ey) AS BIGINT) AS syy,
             CAST(SUM(ey * ew) AS BIGINT) AS syw,
             CAST(SUM(ey * ex) AS BIGINT) AS syx,
             CAST(SUM(ew * ew) AS BIGINT) AS sww,
             CAST(SUM(ex * ex) AS BIGINT) AS sxx,
             CAST(SUM(ew * ex) AS BIGINT) AS swx
      FROM e
    )
    SELECT s.syy, s.syw, s.syx, s.sww, s.sxx, s.swx, m.n,
           CAST(FLOOR(1000000.0
             * ((CAST(s.syy AS DOUBLE) - CAST(s.syw AS DOUBLE) * s.syw
                   / NULLIF(CAST(s.sww AS DOUBLE), 0.0))
                - (CAST(s.syy AS DOUBLE)
                   - (CAST(s.syw AS DOUBLE) * s.syw * s.sxx
                      - 2.0 * CAST(s.syw AS DOUBLE) * s.syx * s.swx
                      + CAST(s.syx AS DOUBLE) * s.syx * s.sww)
                     / NULLIF(CAST(s.sww AS DOUBLE) * s.sxx
                              - CAST(s.swx AS DOUBLE) * s.swx, 0.0)))
             / NULLIF((CAST(s.syy AS DOUBLE)
                   - (CAST(s.syw AS DOUBLE) * s.syw * s.sxx
                      - 2.0 * CAST(s.syw AS DOUBLE) * s.syx * s.swx
                      + CAST(s.syx AS DOUBLE) * s.syx * s.sww)
                     / NULLIF(CAST(s.sww AS DOUBLE) * s.sxx
                              - CAST(s.swx AS DOUBLE) * s.swx, 0.0))
                 / (m.n - 3), 0.0)) AS BIGINT) AS f_q6
    FROM s CROSS JOIN m
    """,
    tags=("stats", "timeseries", "causality", "monitoring", "round11"),
)
def q_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality F-test: does yesterday's event VOLUME
    improve the forecast of today's revenue beyond yesterday's revenue
    alone? Restricted model y_t ~ y_{t-1}; unrestricted adds x_{t-1}
    (event count); F = (RSS_r - RSS_u) / (RSS_u / (n - 3)) with one
    numerator df — the monitoring tier's standard
    leading-indicator test (correlation without the lag structure,
    q_crosscorr_lag, can't distinguish lead from contemporaneous).

    Exactness: the day-grain join aligns (y_t, y_{t-1}, x_{t-1});
    centered products use the integer trick v*n - S over exactly the
    regression's observation set, so all six moment sums are exact
    BIGINTs; both RSS values come from the closed-form moment algebra
    (RSS_r = Syy - Syw^2/Sww; RSS_u subtracts the 2-regressor quadratic
    form with determinant Sww*Sxx - Swx^2) in ONE fixed double tree
    with NULLIF-guarded denominators. The n^2-scaled moments stay far
    under 2^63 at every fixture SF (DECIMAL(38,0) is the petabyte
    path).

    Scale shape: one day-grain rollup; the lag join and every moment
    fold run on the SF-invariant <= 30-row observation set.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    prev = daily.select(
        (F.col("d") + 1).alias("d"),
        F.col("cents").alias("w"),
        F.col("n_ev").alias("x"),
    )
    obs = daily.select("d", F.col("cents").alias("y")).join(
        F.broadcast(prev), "d"
    )
    m = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum("x").cast("bigint").alias("sx"),
    )
    e = obs.crossJoin(F.broadcast(m)).select(
        (F.col("y") * F.col("n") - F.col("sy")).cast("bigint").alias("ey"),
        (F.col("w") * F.col("n") - F.col("sw")).cast("bigint").alias("ew"),
        (F.col("x") * F.col("n") - F.col("sx")).cast("bigint").alias("ex"),
    )
    s = e.agg(
        F.sum(F.col("ey") * F.col("ey")).cast("bigint").alias("syy"),
        F.sum(F.col("ey") * F.col("ew")).cast("bigint").alias("syw"),
        F.sum(F.col("ey") * F.col("ex")).cast("bigint").alias("syx"),
        F.sum(F.col("ew") * F.col("ew")).cast("bigint").alias("sww"),
        F.sum(F.col("ex") * F.col("ex")).cast("bigint").alias("sxx"),
        F.sum(F.col("ew") * F.col("ex")).cast("bigint").alias("swx"),
    )
    det = F.nullif(
        F.col("sww").cast("double") * F.col("sxx")
        - F.col("swx").cast("double") * F.col("swx"),
        F.lit(0.0),
    )
    quad = (
        F.col("syw").cast("double") * F.col("syw") * F.col("sxx")
        - F.lit(2.0) * F.col("syw").cast("double") * F.col("syx") * F.col("swx")
        + F.col("syx").cast("double") * F.col("syx") * F.col("sww")
    )
    rss_r = F.col("syy").cast("double") - F.col("syw").cast("double") * F.col(
        "syw"
    ) / F.nullif(F.col("sww").cast("double"), F.lit(0.0))
    rss_u = F.col("syy").cast("double") - quad / det
    return s.crossJoin(F.broadcast(m)).select(
        "syy",
        "syw",
        "syx",
        "sww",
        "sxx",
        "swx",
        "n",
        F.floor(
            F.lit(1000000.0)
            * (rss_r - rss_u)
            / F.nullif(rss_u / (F.col("n") - 3), F.lit(0.0))
        )
        .cast("bigint")
        .alias("f_q6"),
    )

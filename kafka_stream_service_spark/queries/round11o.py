"""Round-11 batch 15: binary-classifier summary statistics (Matthews
correlation, odds ratio with Woolf confidence interval) and the partial
autocorrelation completion of the time-series tier (Durbin-Levinson at
lags 1-2) — each one exact-integer census + one fixed double tree.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; these extend the mandated quality-filter eval and
monitoring tiers with exact-arithmetic driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query
from .round11c import _FILTER_A_SQL, _FILTER_B_SQL

# ---------------------------------------------------------------------------
# Matthews correlation coefficient between two quality filters
# ---------------------------------------------------------------------------


@query(
    "q_mcc_filters",
    oracle=f"""
    WITH verdicts AS (
      SELECT CASE WHEN {_FILTER_A_SQL} THEN 1 ELSE 0 END AS a,
             CASE WHEN {_FILTER_B_SQL} THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(a * b) AS BIGINT) AS tp,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS fn_,
             CAST(SUM((1 - a) * b) AS BIGINT) AS fp,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS tn
      FROM verdicts
    )
    SELECT tp, fp, fn_, tn,
           CAST(FLOOR(1000000000.0
             * (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn_)
             / NULLIF(SQRT(CAST(tp + fp AS DOUBLE) * (tp + fn_)
                           * (tn + fp) * (tn + fn_)), 0.0)) AS BIGINT)
             AS mcc_q9
    FROM cells
    """,
    tags=("stats", "eval", "agreement", "quality", "llm-data", "round11"),
)
def q_mcc_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient between the word-count and
    lexical-diversity quality filters (filter A as reference labels,
    filter B as predictions): the single balanced summary of the 2x2
    confusion table that stays honest under class imbalance — the
    number to report when one filter passes 90% of documents and
    accuracy/F1 flatter the trivial always-pass predictor. MCC is the
    phi coefficient: (TP*TN - FP*FN)/sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)).

    Exactness: the four cells come from one scan as exact integers;
    MCC is one quantized double tree (NULLIF maps a degenerate margin
    to NULL identically on both engines).

    Scale shape: one scan, one 4-cell global rollup, a 1-row emission.
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    a = ((F.size(toks) >= 20) & (F.size(toks) <= 90)).cast("int")
    b = (2 * F.size(F.array_distinct(toks)) >= F.size(toks)).cast("int")
    cells = d.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("tp"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("fn_"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("fp"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("tn"),
    )
    return cells.select(
        "tp",
        "fp",
        "fn_",
        "tn",
        F.floor(
            F.lit(1000000000.0)
            * (
                F.col("tp").cast("double") * F.col("tn")
                - F.col("fp").cast("double") * F.col("fn_")
            )
            / F.nullif(
                F.sqrt(
                    (F.col("tp") + F.col("fp")).cast("double")
                    * (F.col("tp") + F.col("fn_"))
                    * (F.col("tn") + F.col("fp"))
                    * (F.col("tn") + F.col("fn_"))
                ),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("mcc_q9"),
    )


# ---------------------------------------------------------------------------
# Odds ratio with Woolf (log-normal) 95% confidence interval
# ---------------------------------------------------------------------------

# z_{0.975} as a Python literal so both engines consume the same
# constant (the SPRT/log-constant recipe).
_Z975 = 1.959963984540054


@query(
    "q_odds_ratio_ci",
    oracle=f"""
    WITH x AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS exposed,
             CASE WHEN {_FILTER_A_SQL} THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(exposed * y) AS BIGINT) AS a,
             CAST(SUM(exposed * (1 - y)) AS BIGINT) AS b,
             CAST(SUM((1 - exposed) * y) AS BIGINT) AS c,
             CAST(SUM((1 - exposed) * (1 - y)) AS BIGINT) AS d
      FROM x
    )
    SELECT a, b, c, d,
           CAST(FLOOR(1000000.0 * LN(
             (CAST(a AS DOUBLE) * d) / NULLIF(CAST(b AS DOUBLE) * c, 0.0)))
             AS BIGINT) AS ln_or_q6,
           CAST(FLOOR(1000000.0 * (LN(
             (CAST(a AS DOUBLE) * d) / NULLIF(CAST(b AS DOUBLE) * c, 0.0))
             - {_Z975} * SQRT(1.0 / NULLIF(CAST(a AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(b AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(c AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(d AS DOUBLE), 0.0))))
             AS BIGINT) AS ln_or_lo_q6,
           CAST(FLOOR(1000000.0 * (LN(
             (CAST(a AS DOUBLE) * d) / NULLIF(CAST(b AS DOUBLE) * c, 0.0))
             + {_Z975} * SQRT(1.0 / NULLIF(CAST(a AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(b AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(c AS DOUBLE), 0.0)
                              + 1.0 / NULLIF(CAST(d AS DOUBLE), 0.0))))
             AS BIGINT) AS ln_or_hi_q6
    FROM cells
    """,
    tags=("stats", "effect-size", "quality", "llm-data", "round11"),
)
def q_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of passing the word-count quality filter for English
    vs non-English documents, with the Woolf 95% log-normal confidence
    interval: ln OR +/- z * sqrt(1/a + 1/b + 1/c + 1/d) — the
    effect-size-with-uncertainty report a curation review wants where
    a bare p-value (q_chi2_independence) only says "not independent".
    The z quantile is a Python literal in both plans (the SPRT
    log-constant recipe), so no cross-engine quantile function is
    trusted.

    Exactness: the 2x2 cells are exact integers from one scan; all
    three emissions are single quantized double trees over them, with
    every division NULLIF-guarded so a zero cell maps the affected
    emission to NULL identically on both engines.

    Scale shape: one scan, one 4-cell rollup, a 1-row emission.
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    exposed = (F.col("lang") == "en").cast("int")
    y = ((F.size(toks) >= 20) & (F.size(toks) <= 90)).cast("int")
    cells = d.select(exposed.alias("exposed"), y.alias("y")).agg(
        F.sum(F.col("exposed") * F.col("y")).cast("bigint").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("y"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("y")).cast("bigint").alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("y"))).cast("bigint").alias("d"),
    )
    ln_or = F.log(
        (F.col("a").cast("double") * F.col("d"))
        / F.nullif(F.col("b").cast("double") * F.col("c"), F.lit(0.0))
    )
    half = F.lit(_Z975) * F.sqrt(
        F.lit(1.0) / F.nullif(F.col("a").cast("double"), F.lit(0.0))
        + F.lit(1.0) / F.nullif(F.col("b").cast("double"), F.lit(0.0))
        + F.lit(1.0) / F.nullif(F.col("c").cast("double"), F.lit(0.0))
        + F.lit(1.0) / F.nullif(F.col("d").cast("double"), F.lit(0.0))
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.floor(F.lit(1000000.0) * ln_or).cast("bigint").alias("ln_or_q6"),
        F.floor(F.lit(1000000.0) * (ln_or - half))
        .cast("bigint")
        .alias("ln_or_lo_q6"),
        F.floor(F.lit(1000000.0) * (ln_or + half))
        .cast("bigint")
        .alias("ln_or_hi_q6"),
    )


# ---------------------------------------------------------------------------
# Partial autocorrelation at lags 1-2 (Durbin-Levinson) of daily revenue
# ---------------------------------------------------------------------------


@query(
    "q_pacf_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
      FROM daily
    ),
    dev AS (
      SELECT d, CAST(cents * m.n - m.s AS BIGINT) AS e
      FROM daily CROSS JOIN m
    ),
    gam AS (
      SELECT
        CAST(SUM(a.e * a.e) AS BIGINT) AS g0,
        CAST(SUM(CASE WHEN b1.e IS NOT NULL THEN a.e * b1.e END) AS BIGINT) AS g1,
        CAST(SUM(CASE WHEN b2.e IS NOT NULL THEN a.e * b2.e END) AS BIGINT) AS g2
      FROM dev a
      LEFT JOIN dev b1 ON b1.d = a.d + 1
      LEFT JOIN dev b2 ON b2.d = a.d + 2
    )
    SELECT g0, g1, g2,
           CAST(FLOOR(1000000.0 * CAST(g1 AS DOUBLE)
                / NULLIF(CAST(g0 AS DOUBLE), 0.0)) AS BIGINT) AS pacf1_q6,
           CAST(FLOOR(1000000.0
             * (CAST(g2 AS DOUBLE) * g0 - CAST(g1 AS DOUBLE) * g1)
             / NULLIF(CAST(g0 AS DOUBLE) * g0 - CAST(g1 AS DOUBLE) * g1, 0.0))
             AS BIGINT) AS pacf2_q6
    FROM gam
    """,
    tags=("stats", "timeseries", "monitoring", "round11"),
)
def q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily revenue series at lags 1
    and 2 via Durbin-Levinson: phi_11 = rho_1 and phi_22 =
    (rho_2 - rho_1^2)/(1 - rho_1^2) — the AR-order diagnostic
    q_autocorr_lag's raw ACF cannot give (a pure AR(1) has nonzero ACF
    at every lag but PACF cuts off after 1; phi_22 is the direct
    lag-2 effect with lag 1 regressed out), the standard read before
    fitting the forecast tier's AR models.

    Exactness: centered products use the integer trick e_t = n*x_t - S
    (so no fractional mean is materialized): rho_k = gamma_k / gamma_0
    with gamma_k = sum e_t e_{t+k} exact BIGINTs over the <= 31-day
    grain; both PACF values are single quantized double trees of the
    three gammas (phi_22's algebra clears denominators exactly). The
    n^2-scaled gammas stay far under 2^63 at every fixture SF; at
    petabyte daily volumes they move to DECIMAL(38,0)/HUGEINT (the
    q_power_iteration emission pattern).

    Scale shape: one day-grain rollup; the lag joins and folds run on
    the SF-invariant <= 31-row series.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "d", (F.col("cents") * F.col("n") - F.col("s")).cast("bigint").alias("e")
    )
    b1 = dev.select((F.col("d") - 1).alias("d"), F.col("e").alias("e1"))
    b2 = dev.select((F.col("d") - 2).alias("d"), F.col("e").alias("e2"))
    gam = (
        dev.join(F.broadcast(b1), "d", "left")
        .join(F.broadcast(b2), "d", "left")
        .agg(
            F.sum(F.col("e") * F.col("e")).cast("bigint").alias("g0"),
            F.sum(
                F.when(F.col("e1").isNotNull(), F.col("e") * F.col("e1"))
            )
            .cast("bigint")
            .alias("g1"),
            F.sum(
                F.when(F.col("e2").isNotNull(), F.col("e") * F.col("e2"))
            )
            .cast("bigint")
            .alias("g2"),
        )
    )
    return gam.select(
        "g0",
        "g1",
        "g2",
        F.floor(
            F.lit(1000000.0)
            * F.col("g1").cast("double")
            / F.nullif(F.col("g0").cast("double"), F.lit(0.0))
        )
        .cast("bigint")
        .alias("pacf1_q6"),
        F.floor(
            F.lit(1000000.0)
            * (
                F.col("g2").cast("double") * F.col("g0")
                - F.col("g1").cast("double") * F.col("g1")
            )
            / F.nullif(
                F.col("g0").cast("double") * F.col("g0")
                - F.col("g1").cast("double") * F.col("g1"),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("pacf2_q6"),
    )

"""Round-11 batch 18: residual-whiteness (Ljung-Box), the Page-Hinkley
drift statistic (the running-mean counterpart of CUSUM's fixed
baseline), and Dunn's post-hoc pairwise test (the follow-up
q_kruskal_wallis prescribes when its omnibus H rejects) — closing the
time-series-diagnostic and multiple-comparison gaps.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; these extend the mandated monitoring and
hypothesis-testing tiers with exact-arithmetic driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test (lags 1-3) on daily revenue
# ---------------------------------------------------------------------------

_LB_H = 3


@query(
    "q_ljung_box",
    oracle=f"""
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
    lagk AS (
      SELECT k.k, CAST(SUM(a.e * b.e) AS BIGINT) AS g_k
      FROM dev a
      CROSS JOIN (SELECT unnest(range(1, {_LB_H} + 1)) AS k) k
      JOIN dev b ON b.d = a.d + k.k
      GROUP BY k.k
    ),
    g0 AS (SELECT CAST(SUM(e * e) AS BIGINT) AS g0 FROM dev),
    terms AS (
      SELECT l.k, l.g_k,
             CAST(FLOOR(1000000000.0
               * (CAST(l.g_k AS DOUBLE) / g0.g0)
               * (CAST(l.g_k AS DOUBLE) / g0.g0)
               / (m.n - l.k)) AS BIGINT) AS term_q9
      FROM lagk l CROSS JOIN g0 CROSS JOIN m
    )
    SELECT CAST(SUM(CASE WHEN k = 1 THEN g_k END) AS BIGINT) AS g1,
           CAST(SUM(CASE WHEN k = 2 THEN g_k END) AS BIGINT) AS g2,
           CAST(SUM(CASE WHEN k = 3 THEN g_k END) AS BIGINT) AS g3,
           m.n,
           CAST(FLOOR(CAST(m.n AS DOUBLE) * (m.n + 2)
                * CAST(SUM(term_q9) AS DOUBLE) / 1000.0) AS BIGINT) AS q_lb_q6
    FROM terms CROSS JOIN m
    GROUP BY m.n
    """,
    tags=("stats", "timeseries", "diagnostic", "monitoring", "round11"),
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test at lags 1-3 on the daily
    revenue series: Q = n(n+2) * sum_k rho_k^2/(n-k) — the joint
    "is there ANY remaining autocorrelation" diagnostic that single-lag
    reads (q_autocorr_lag, q_pacf_daily) cannot aggregate, and the
    standard residual check after fitting the forecast tier's models.

    Exactness: gammas use the integer-centering trick e_t = n*x_t - S
    (exact BIGINTs on the day grain); each lag's rho_k^2/(n-k) term is
    floor-quantized to q9 BEFORE the sum (the per-term recipe), and Q
    is one final quantized double product (q9 terms scaled to q6
    output via the /1000).

    Scale shape: one day-grain rollup; the lag joins and folds run on
    the SF-invariant <= 31-row series x 3 lags.
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
    ks = spark.range(1, _LB_H + 1).select(F.col("id").cast("bigint").alias("k"))
    b = dev.select(F.col("d").alias("db"), F.col("e").alias("eb"))
    lagk = (
        dev.crossJoin(F.broadcast(ks))
        .join(
            F.broadcast(b),
            F.col("db") == F.col("d") + F.col("k"),
        )
        .groupBy("k")
        .agg(F.sum(F.col("e") * F.col("eb")).cast("bigint").alias("g_k"))
    )
    g0 = dev.agg(F.sum(F.col("e") * F.col("e")).cast("bigint").alias("g0"))
    rho = F.col("g_k").cast("double") / F.col("g0")
    terms = (
        lagk.crossJoin(F.broadcast(g0))
        .crossJoin(F.broadcast(m))
        .select(
            "k",
            "g_k",
            F.floor(F.lit(1000000000.0) * rho * rho / (F.col("n") - F.col("k")))
            .cast("bigint")
            .alias("term_q9"),
        )
    )
    return (
        terms.crossJoin(F.broadcast(m.select("n")))
        .groupBy("n")
        .agg(
            F.sum(F.when(F.col("k") == 1, F.col("g_k"))).cast("bigint").alias("g1"),
            F.sum(F.when(F.col("k") == 2, F.col("g_k"))).cast("bigint").alias("g2"),
            F.sum(F.when(F.col("k") == 3, F.col("g_k"))).cast("bigint").alias("g3"),
            F.floor(
                F.col("n").cast("double")
                * (F.col("n") + 2)
                * F.sum("term_q9").cast("double")
                / F.lit(1000.0)
            )
            .cast("bigint")
            .alias("q_lb_q6"),
        )
        .select("g1", "g2", "g3", "n", "q_lb_q6")
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift statistic over daily revenue
# ---------------------------------------------------------------------------

# delta (the indifference half-width) = 1/64 of the day-1..t running
# mean, folded into the exact integer recursion below.


@query(
    "q_page_hinkley",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT d, x,
             SUM(x) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
      FROM daily
    ),
    inc AS (
      -- 64*t*(x_t - mean_t - mean_t/64) = 64*t*x_t - 65*s_t: exact
      -- integers; each increment quantizes the /t division to q6
      SELECT d, x, t,
             CAST(FLOOR(1000000.0 * CAST(64 * t * x - 65 * s_t AS DOUBLE)
                  / (64.0 * t)) AS BIGINT) AS inc_q6
      FROM cum
    ),
    walk AS (
      SELECT d, x, t,
             SUM(inc_q6) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_t
      FROM inc
    )
    SELECT d, x, CAST(m_t AS BIGINT) AS m_t_q6,
           CAST(m_t - MIN(m_t) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS ph_q6
    FROM walk
    """,
    tags=("stats", "timeseries", "drift", "monitoring", "round11"),
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift statistic over daily revenue: m_t =
    sum_{i<=t} (x_i - mean_i - delta) with the RUNNING mean mean_i
    (PH's defining difference from q_cusum_drift's fixed baseline —
    PH self-calibrates as it walks) and indifference delta = mean_i/64;
    the monitored statistic PH_t = m_t - min_{u<=t} m_u grows only
    under a sustained upward shift. Emitted per day so the alarm
    trajectory is auditable.

    Exactness: 64*t*(x_t - mean_t - mean_t/64) = 64*t*x_t - 65*S_t is
    an exact integer; each day's increment quantizes the single /t
    division to q6 BEFORE the cumulative sums (per-term recipe), so
    the walk and its prefix-min are order-free integers.

    Scale shape: one day-grain rollup; all windows run on the
    SF-invariant <= 31-row series.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        "x",
        F.sum("x").over(w).alias("s_t"),
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
    )
    inc = cum.select(
        "d",
        "x",
        "t",
        F.floor(
            F.lit(1000000.0)
            * (64 * F.col("t") * F.col("x") - 65 * F.col("s_t")).cast("double")
            / (F.lit(64.0) * F.col("t"))
        )
        .cast("bigint")
        .alias("inc_q6"),
    )
    walk = inc.select(
        "d", "x", "t", F.sum("inc_q6").over(w).alias("m_t")
    )
    return walk.select(
        "d",
        "x",
        F.col("m_t").cast("bigint").alias("m_t_q6"),
        (F.col("m_t") - F.min("m_t").over(w)).cast("bigint").alias("ph_q6"),
    )


# ---------------------------------------------------------------------------
# Dunn's post-hoc pairwise test after Kruskal-Wallis
# ---------------------------------------------------------------------------


@query(
    "q_dunns_test",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS val, l_returnflag AS grp
      FROM lineitem
    ),
    tv AS (SELECT val, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY val),
    cum AS (
      SELECT val, t,
             SUM(t) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS below
      FROM tv
    ),
    gv AS (
      SELECT grp, val, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY grp, val
    ),
    ranked AS (
      -- doubled average rank of value u: 2*below + t + 1
      SELECT g.grp, g.c, 2 * c2.below + c2.t + 1 AS r2
      FROM gv g JOIN cum c2 ON c2.val = g.val
    ),
    gr AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS n_i,
             CAST(SUM(c * r2) AS BIGINT) AS sr2_i
      FROM ranked GROUP BY grp
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n FROM gr
    ),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM tv
    )
    SELECT a.grp AS grp_a, b.grp AS grp_b, a.n_i AS n_a, b.n_i AS n_b,
           CAST(FLOOR(1000000.0
             * (CAST(a.sr2_i AS DOUBLE) / (2.0 * a.n_i)
                - CAST(b.sr2_i AS DOUBLE) / (2.0 * b.n_i))
             / NULLIF(SQRT((CAST(t.n AS DOUBLE) * (t.n + 1) / 12.0
                            - CAST(ti.tie3 AS DOUBLE) / (12.0 * (t.n - 1)))
                           * (1.0 / a.n_i + 1.0 / b.n_i)), 0.0))
             AS BIGINT) AS z_q6
    FROM gr a JOIN gr b ON a.grp < b.grp
    CROSS JOIN tot t CROSS JOIN ties ti
    """,
    tags=("stats", "nonparametric", "post-hoc", "multiple-testing", "round11"),
)
def q_dunns_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's (1964) post-hoc pairwise comparisons after
    q_kruskal_wallis (same values, same groups, same pooled ranks):
    for each return-flag pair, z = (Rbar_a - Rbar_b) / sqrt(
    (N(N+1)/12 - T/(12(N-1))) * (1/n_a + 1/n_b)) with the standard
    tie correction T = sum(t^3 - t) — the "WHICH groups differ" answer
    an omnibus H cannot give (its rejection only says "some pair").
    Three rows, one per pair; the caller applies their preferred
    multiplicity control (q_benjamini_hochberg's step-up is the
    catalog's).

    Exactness: pooled doubled ranks come exactly from the bounded
    value census (2*below + t + 1); per-group rank sums are exact
    BIGINTs; each pairwise z is one quantized double tree (mean ranks
    halve the doubled sums inside the tree).

    Scale shape: one (group x value) census; everything after runs on
    <= 150 cells and the 3-pair grid.
    """
    li = tables(spark, sf_dir)["lineitem"]
    v = li.select(
        F.col("l_quantity").cast("bigint").alias("val"),
        F.col("l_returnflag").alias("grp"),
    )
    tv = v.groupBy("val").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wv = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    cum = tv.select(
        "val", "t", (F.sum("t").over(wv) - F.col("t")).alias("below")
    )
    gv = v.groupBy("grp", "val").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = gv.join(F.broadcast(cum), "val").select(
        "grp", "c", (2 * F.col("below") + F.col("t") + 1).alias("r2")
    )
    gr = ranked.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_i"),
        F.sum(F.col("c") * F.col("r2")).cast("bigint").alias("sr2_i"),
    )
    tot = gr.agg(F.sum("n_i").cast("bigint").alias("n"))
    ties = tv.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3")
    )
    a = gr.select(
        F.col("grp").alias("grp_a"),
        F.col("n_i").alias("n_a"),
        F.col("sr2_i").alias("sr2_a"),
    )
    b = gr.select(
        F.col("grp").alias("grp_b"),
        F.col("n_i").alias("n_b"),
        F.col("sr2_i").alias("sr2_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            F.floor(
                F.lit(1000000.0)
                * (
                    F.col("sr2_a").cast("double") / (F.lit(2.0) * F.col("n_a"))
                    - F.col("sr2_b").cast("double") / (F.lit(2.0) * F.col("n_b"))
                )
                / F.nullif(
                    F.sqrt(
                        (
                            F.col("n").cast("double")
                            * (F.col("n") + 1)
                            / F.lit(12.0)
                            - F.col("tie3").cast("double")
                            / (F.lit(12.0) * (F.col("n") - 1))
                        )
                        * (
                            F.lit(1.0) / F.col("n_a")
                            + F.lit(1.0) / F.col("n_b")
                        )
                    ),
                    F.lit(0.0),
                )
            )
            .cast("bigint")
            .alias("z_q6"),
        )
    )

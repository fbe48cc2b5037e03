"""Statistical-audit operators (round 6 extension): chi-square
independence testing, Shannon-entropy profiling, Gini concentration,
and seasonal (same-weekday) deviation screening.

These are the distribution-level data-quality checks a corpus/telemetry
pipeline runs per batch: has the event mix drifted from independence,
how diverse is each source, how concentrated is the revenue/document
mass, which days break their weekday seasonality. They complement the
pointwise audits (q_data_quality_report, q_benford_digit_audit) and the
divergence audit (q_corpus_drift_kl).

Determinism recipe (shared with mlops.py): ratios leave as
floor(x*1e6) over IEEE-deterministic double pipelines whose inputs are
exact integers; transcendentals (ln) are floor-quantized per TYPE before
any summation, making every aggregation integer arithmetic.

Weekday extraction is pure date arithmetic — datediff from a fixed
Monday anchor mod 7 — because the engines disagree on dayofweek()
numbering conventions (Spark 1=Sunday, DuckDB 0=Sunday); arithmetic
needs no convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec
from .registry import query


# ---------------------------------------------------------------------------
# Chi-square independence: event_type x weekday
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH obs AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7 AS wd,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT wd, SUM(o) AS c FROM obs GROUP BY wd),
    n AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
      SELECT obs.event_type, obs.wd,
             CAST(FLOOR(1000000.0
                  * (CAST(n.n * obs.o - rt.r * ct.c AS DOUBLE)
                     * CAST(n.n * obs.o - rt.r * ct.c AS DOUBLE))
                  / (CAST(n.n AS DOUBLE) * rt.r * ct.c)) AS BIGINT) AS cell_micro
      FROM obs JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN n
    )
    SELECT CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
           CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM cells
"""


@query(
    "q_chi2_independence",
    oracle=_CHI2_ORACLE,
    tags=("stat-audit", "quality"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for event-type x weekday
    independence — the drift alarm for 'did the weekly event mix
    change'. Per-cell contribution (N*o - r*c)^2 / (N*r*c) is computed
    from exact integer marginals and floor-quantized to micro units
    BEFORE the sum, so the statistic is an integer on both engines.

    Scale shape: the base table collapses to |types| x 7 cells in one
    map-side-combinable aggregation; marginals re-join the cell frame by
    broadcast (they are type- and weekday-sized); nothing after the
    first shuffle scales with the data.
    """
    ev = tables(spark, sf_dir)["events"]
    obs = ev.groupBy(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05")) % 7).alias("wd"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("wd").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    diff = F.col("n") * F.col("o") - F.col("r") * F.col("c")
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(
                F.lit(1000000.0)
                * (diff.cast("double") * diff.cast("double"))
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
            )
            .cast("bigint")
            .alias("cell_micro"),
            "r",
            "c",
            "n",
        )
    )
    n_types = rt.agg(F.count(F.lit(1)).alias("k")).collect()[0]["k"]
    n_wd = ct.agg(F.count(F.lit(1)).alias("k")).collect()[0]["k"]
    return cells.agg(
        F.sum("cell_micro").cast("bigint").alias("chi2_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.lit((n_types - 1) * (n_wd - 1)).cast("bigint").alias("dof"),
        F.max("n").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the language mix per source
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    n AS (SELECT source, SUM(c) AS n FROM c GROUP BY source),
    terms AS (
      SELECT c.source, c.c, n.n,
             CAST(FLOOR(1000000.0 * c.c
                        * ln(CAST(n.n AS DOUBLE) / c.c)) AS BIGINT) AS term_micro
      FROM c JOIN n USING (source)
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(FLOOR(CAST(SUM(term_micro) AS DOUBLE) / MAX(n)) AS BIGINT)
             AS h_micro
    FROM terms GROUP BY source
"""


@query(
    "q_entropy_by_source",
    oracle=_ENTROPY_ORACLE,
    tags=("stat-audit", "text", "llm-data"),
)
def q_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (micro-nats) of each source's language
    distribution: H = sum (c/n) ln(n/c) — the diversity profile that
    flags monolingual or collapsed sources in a crawl. Each ln term is
    floor-quantized per (source, lang) TYPE before summation; the final
    division is one floor over exact integers.

    Scale shape: two map-side-combinable aggregations ((source,lang)
    then source) — the per-source counts frame joins back by its own
    group key, so the second join is shuffle-free under AQE; nothing
    holds more than |sources| x |langs| rows.
    """
    d = tables(spark, sf_dir)["documents"]
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("source").agg(F.sum("c").alias("n"))
    terms = c.join(F.broadcast(n), "source").select(
        "source",
        "n",
        F.floor(
            F.lit(1000000.0)
            * F.col("c")
            * F.log(F.col("n").cast("double") / F.col("c"))
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    return terms.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.floor(F.sum("term_micro").cast("double") / F.max("n"))
        .cast("bigint")
        .alias("h_micro"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer revenue
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
    WITH x AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS v
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM x
    ),
    s AS (
      SELECT MAX(n) AS n,
             SUM(CAST(i AS HUGEINT) * v) AS iv,
             SUM(CAST(v AS HUGEINT)) AS sv
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(FLOOR((2.0 * CAST(iv AS DOUBLE) - (n + 1.0) * CAST(sv AS DOUBLE))
                      * 1000000 / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)))
                AS BIGINT) AS gini_ppm
    FROM s
"""


@query(
    "q_gini_concentration",
    oracle=_GINI_ORACLE,
    tags=("stat-audit", "bi"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over the
    ascending-sorted per-customer revenue (ties broken by custkey).
    The inequality audit — the same op profiles document-mass
    concentration across sources in a corpus.

    Exactness: revenues are integer cents; rank-weighted sums run in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — at SF100 sum(i*x)
    reaches ~1e21, past bigint but 17 digits inside the 128-bit types;
    the final expression is the floor-ppm double pipeline.

    Scale shape: orders collapse to the customer dimension first (one
    map-side-combinable shuffle). The rank window then runs over that
    dimension-sized series — bounded by |customers|, not |orders|; at
    extreme customer cardinality the same ranks come from
    repartitionByRange + per-partition offsets (two-phase distributed
    rank), the documented replan shared with q_calibration_bins.
    """
    orders = tables(spark, sf_dir)["orders"]
    x = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice") * 100).cast("bigint").alias("v")
    )
    ranked = x.select(
        "v",
        F.row_number().over(Window.orderBy("v", "o_custkey")).alias("i"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("v")).alias("iv"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.floor(
            (
                F.lit(2.0) * F.col("iv").cast("double")
                - (F.col("n") + F.lit(1.0)) * F.col("sv").cast("double")
            )
            * 1000000
            / (F.col("n").cast("double") * F.col("sv").cast("double"))
        )
        .cast("bigint")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# Seasonal (same-weekday) deviation screen
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
    WITH daily AS (
      SELECT o_orderdate AS d,
             date_diff('day', DATE '1970-01-05', o_orderdate) % 7 AS wd,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ),
    wdstats AS (
      SELECT wd, COUNT(*) AS n_wd, SUM(x) AS s_wd FROM daily GROUP BY wd
    ),
    scored AS (
      SELECT daily.d, daily.wd, daily.x,
             CAST(FLOOR(CAST(wdstats.n_wd * daily.x - wdstats.s_wd AS DOUBLE)
                        * 1000000 / wdstats.s_wd) AS BIGINT) AS dev_ppm
      FROM daily JOIN wdstats USING (wd)
    )
    SELECT CAST(d AS TIMESTAMP) AS day_ts, wd, x AS revenue_cents, dev_ppm
    FROM scored
    ORDER BY abs(dev_ppm) DESC, d
    LIMIT 20
"""


@query(
    "q_seasonal_weekday_deviation",
    oracle=_SEASONAL_ORACLE,
    tags=("stat-audit", "timeseries"),
)
def q_seasonal_weekday_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly screen: each day's revenue against the
    mean of ITS OWN weekday (Mondays vs Mondays), surfacing the top-20
    |deviation| days — the screen that doesn't false-alarm on ordinary
    weekend dips. Mean clearing is the n-scaling trick (n_wd*x - S_wd,
    exact integers); deviation leaves as floor-ppm.

    Scale shape: one aggregation to the day grain, one 7-row weekday
    stats frame joined back by BROADCAST, and a TakeOrdered(20) — no
    global sort materializes.
    """
    orders = tables(spark, sf_dir)["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").alias("d"),
        (F.datediff(F.col("o_orderdate"), F.lit("1970-01-05")) % 7).alias("wd"),
    ).agg(F.sum(dec("o_totalprice") * 100).cast("bigint").alias("x"))
    wdstats = daily.groupBy("wd").agg(
        F.count(F.lit(1)).alias("n_wd"), F.sum("x").alias("s_wd")
    )
    scored = daily.join(F.broadcast(wdstats), "wd").select(
        F.col("d").cast("timestamp").alias("day_ts"),
        "wd",
        F.col("x").alias("revenue_cents"),
        F.floor(
            (F.col("n_wd") * F.col("x") - F.col("s_wd")).cast("double")
            * 1000000
            / F.col("s_wd")
        )
        .cast("bigint")
        .alias("dev_ppm"),
    )
    return scored.orderBy(F.abs(F.col("dev_ppm")).desc(), "day_ts").limit(20)


_DISTRANK_ORACLE = """
    WITH t AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM orders
    )
    SELECT CAST(10 AS BIGINT) AS quantile_pct,
           CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY v) AS BIGINT)
             AS value FROM t
    UNION ALL
    SELECT CAST(25 AS BIGINT) AS quantile_pct,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT)
             AS value FROM t
    UNION ALL
    SELECT CAST(50 AS BIGINT) AS quantile_pct,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)
             AS value FROM t
    UNION ALL
    SELECT CAST(75 AS BIGINT) AS quantile_pct,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS BIGINT)
             AS value FROM t
    UNION ALL
    SELECT CAST(90 AS BIGINT) AS quantile_pct,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT)
             AS value FROM t
"""


@query(
    "q_distributed_exact_quantiles",
    oracle=_DISTRANK_ORACLE,
    tags=("stat-audit", "distributed-rank", "scale"),
)
def q_distributed_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles with NO single-partition stage: the
    two-phase range-partition rank (operators/ranks.py) — range
    exchange, per-partition parallel rank windows, driver-side prefix
    sum over |partitions| counts, codegen offset add — then the value
    at rank ceil(p*N) for p in {10,25,50,75,90}%. The oracle is
    percentile_disc, so the distributed algorithm must reproduce the
    sort-based definition bit-for-bit.

    This is the operator the catalog's global-order queries
    (calibration bins, Gini, ntile family) name as their at-scale
    replan — here it IS the implementation, plan-asserted to contain a
    range exchange and NO SinglePartition window exchange
    (tests/test_plans.py). At 100 TB: the range exchange is the only
    full-data movement; every window runs partition-parallel; driver
    state is one row per partition.
    """
    from ..operators.ranks import exact_quantiles

    orders = tables(spark, sf_dir)["orders"].select(
        (dec("o_totalprice") * 100).cast("bigint").alias("v"),
        F.col("o_orderkey").alias("tb"),
    )
    return exact_quantiles(
        orders, "v", "tb", [0.10, 0.25, 0.50, 0.75, 0.90]
    ).select(F.col("quantile_pct").cast("bigint").alias("quantile_pct"), "value")


# ---------------------------------------------------------------------------
# Weighted median (aggregated-series form)
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v_c,
             CAST(props ->> '$.k' AS BIGINT) AS wt
      FROM events
    ),
    per AS (
      SELECT event_type, v_c, SUM(wt) AS w FROM v GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, v_c, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY v_c
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_w,
             SUM(w) OVER (PARTITION BY event_type) AS total_w
      FROM per
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN 2 * cum_w >= total_w THEN v_c END) AS BIGINT)
             AS wmedian_cents,
           CAST(MAX(total_w) AS BIGINT) AS total_weight
    FROM ser GROUP BY event_type
"""


@query(
    "q_weighted_median",
    oracle=_WMEDIAN_ORACLE,
    tags=("stat-audit", "robust-stats"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per event type (weights = the payload's k): the
    smallest value whose cumulative weight reaches half the total — the
    robust center estimate when observations carry importance weights
    (sampled telemetry, token-weighted doc stats). percentile_disc has
    no weighted form in either engine, so BOTH sides state the
    definition directly on the per-value aggregated series: one
    map-side-combinable (type, value) roll-up, then a cumulative-weight
    window over |distinct values| rows per type — never the raw stream.
    All integers end to end.
    """
    ev = tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("v_c"),
        F.get_json_object("props", "$.k").cast("bigint").alias("wt"),
    )
    per = v.groupBy("event_type", "v_c").agg(F.sum("wt").alias("w"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    ser = per.select(
        "event_type",
        "v_c",
        F.sum("w").over(w_cum).alias("cum_w"),
        F.sum("w").over(w_all).alias("total_w"),
    )
    return ser.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("cum_w") >= F.col("total_w"), F.col("v_c")))
        .cast("bigint")
        .alias("wmedian_cents"),
        F.max("total_w").cast("bigint").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve (the plot behind the Gini coefficient)
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
    WITH x AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS v
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT v,
             ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(CAST(v AS HUGEINT)) OVER (ORDER BY v, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v,
             SUM(CAST(v AS HUGEINT)) OVER () AS tot_v
      FROM x
    ),
    deciles AS (
      SELECT CAST(10.0 * i / n AS INT) AS decile, cum_v, tot_v, i, n
      FROM ranked
      WHERE i IN (SELECT CAST(FLOOR(n * d / 10.0) AS BIGINT)
                  FROM (SELECT DISTINCT n FROM ranked),
                       unnest(range(1, 11)) AS u(d))
    )
    SELECT CAST(ROUND(10.0 * i / n) AS BIGINT) AS decile,
           CAST(FLOOR(CAST(cum_v AS DOUBLE) * 1000000 / CAST(tot_v AS DOUBLE))
                AS BIGINT) AS cum_share_ppm
    FROM deciles
"""


@query(
    "q_lorenz_curve",
    oracle=_LORENZ_ORACLE,
    tags=("stat-audit", "bi"),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points: the cumulative revenue share held by the
    bottom d/10 of customers, for d = 1..10 — the curve whose area
    deficit IS q_gini_concentration's coefficient, and the concrete
    'bottom 80% of customers hold X% of revenue' readout. Cumulative
    sums run in HUGEINT/DECIMAL(38,0) over the customer-dimension
    series; the share is the floor-ppm double pipeline.

    Scale shape: identical to the Gini operator — one aggregation to
    the customer grain, a rank/cumsum window over the dimension-sized
    series (two-phase range-partition replan documented there, and
    implemented in operators/ranks.py).
    """
    orders = tables(spark, sf_dir)["orders"]
    x = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice") * 100).cast("bigint").alias("v")
    )
    w_ord = Window.orderBy("v", "o_custkey")
    ranked = x.select(
        "v",
        F.row_number().over(w_ord).alias("i"),
        F.count(F.lit(1)).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)"))
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_v"),
        F.sum(F.col("v").cast("decimal(38,0)"))
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("tot_v"),
    )
    targets = ranked.filter(
        F.expr(
            "i IN ("
            + ", ".join(
                f"CAST(FLOOR(n * {d} / 10.0) AS BIGINT)" for d in range(1, 11)
            )
            + ")"
        )
    )
    return targets.select(
        F.round(10.0 * F.col("i") / F.col("n")).cast("bigint").alias("decile"),
        F.floor(
            F.col("cum_v").cast("double") * 1000000 / F.col("tot_v").cast("double")
        )
        .cast("bigint")
        .alias("cum_share_ppm"),
    )

"""Round-9 operator batch 5: hash-randomized permutation test and
Holt-Winters additive (triple exponential) smoothing.

Family placement: the permutation test is the resampling-based
nonparametric twin of q_welch_ttest over the same two populations —
Monte-Carlo relabeling in the Dwass (1957) style, made deterministic
(and cross-engine exact) by drawing the relabelings from the portable
md5 hash instead of an RNG. Holt-Winters completes the exponential-
smoothing ladder: q_ewma_smoothing (level), q_holt_linear_smoothing
(level+trend), and now level+trend+weekly seasonality — the canonical
triple, as the same WITH RECURSIVE shared-text recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .dedup2 import _h_sql, portable_hash64
from .registry import query
from .round8 import _HOLT_DAILY_DUCK, _holt_daily_frame

# ---------------------------------------------------------------------------
# Deterministic (hash-randomized) two-sample permutation test
# ---------------------------------------------------------------------------

_PERM_K = 32  # relabelings; p-value resolution 1/(K+1)


@query(
    "q_permutation_test_hashed",
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey AS k,
             o_orderstatus AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM orders
      WHERE o_orderstatus IN ('F', 'O')
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN grp = 'F' THEN v END) AS DOUBLE)
               / SUM(CASE WHEN grp = 'F' THEN 1 ELSE 0 END)
           - CAST(SUM(CASE WHEN grp = 'O' THEN v END) AS DOUBLE)
               / SUM(CASE WHEN grp = 'O' THEN 1 ELSE 0 END) AS d_obs
      FROM x
    ),
    rel AS (  -- deterministic relabeling: portable-hash bit per (row, perm)
      SELECT p.i AS perm, x.v,
             {_h_sql("x.k || ':' || p.i", "777")} % 2 AS lbl
      FROM x, (SELECT unnest(range(0, {_PERM_K})) AS i) p
    ),
    perms AS (
      SELECT perm,
             CAST(SUM(CASE WHEN lbl = 0 THEN v END) AS DOUBLE)
               / SUM(CASE WHEN lbl = 0 THEN 1 ELSE 0 END)
           - CAST(SUM(CASE WHEN lbl = 1 THEN v END) AS DOUBLE)
               / SUM(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS d_perm
      FROM rel GROUP BY perm
    )
    SELECT CAST(FLOOR(obs.d_obs) AS BIGINT) AS d_obs_cents,
           CAST({_PERM_K} AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN ABS(p.d_perm) >= ABS(obs.d_obs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
           CAST((1 + SUM(CASE WHEN ABS(p.d_perm) >= ABS(obs.d_obs)
                         THEN 1 ELSE 0 END)) * 1000000
                // ({_PERM_K} + 1) AS BIGINT) AS p_value_q6
    FROM perms p CROSS JOIN obs
    GROUP BY obs.d_obs
    """,
    tags=("stats", "hypothesis-test", "resampling", "round9"),
)
def q_permutation_test_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample permutation test for the F-vs-O order-total mean
    difference (1997 orders), Monte-Carlo style (Dwass 1957) with the
    randomness replaced by the portable md5 hash: relabeling r assigns
    each row the group bit md5(orderkey:r) % 2, the mean difference is
    recomputed under each of the K=32 relabelings, and the p-value is
    (1 + #exceedances)/(K+1). Binomial relabeling (group sizes vary
    per draw) rather than size-preserving permutation — the standard
    large-sample approximation, stated in the contract.

    Exactness: group sums/counts per relabeling are exact integers;
    each mean difference is a fixed double expression over them (IEEE
    division); the exceedance comparison and p-value are
    integer-arithmetic on identical doubles.

    Scale shape: the relabeling explode multiplies rows by K before a
    32-key map-side-combinable aggregation — the shuffle carries only
    K x partitions partial rows. At larger K or data, the same plan
    degrades gracefully (K stays a constant multiplier); the hash is
    the per-row cost, swappable for xxhash64 in production like the
    whole portable family.
    """
    o = tables(spark, sf_dir)["orders"]
    x = o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("grp"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    obs = x.agg(
        (
            F.sum(F.when(F.col("grp") == "F", F.col("v"))).cast("double")
            / F.sum(F.when(F.col("grp") == "F", 1).otherwise(0))
            - F.sum(F.when(F.col("grp") == "O", F.col("v"))).cast("double")
            / F.sum(F.when(F.col("grp") == "O", 1).otherwise(0))
        ).alias("d_obs")
    )
    rel = x.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_K - 1))).alias("perm"),
        F.col("k"),
    ).select(
        "perm",
        "v",
        (
            portable_hash64(
                F.concat(F.col("k").cast("string"), F.lit(":"), F.col("perm").cast("string")),
                777,
            )
            % 2
        ).alias("lbl"),
    )
    perms = rel.groupBy("perm").agg(
        (
            F.sum(F.when(F.col("lbl") == 0, F.col("v"))).cast("double")
            / F.sum(F.when(F.col("lbl") == 0, 1).otherwise(0))
            - F.sum(F.when(F.col("lbl") == 1, F.col("v"))).cast("double")
            / F.sum(F.when(F.col("lbl") == 1, 1).otherwise(0))
        ).alias("d_perm")
    )
    exceed = F.sum(
        F.when(F.abs(F.col("d_perm")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    ).cast("bigint")
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.lit(_PERM_K).cast("bigint").alias("n_perms"),
            exceed.alias("n_exceed"),
        )
        .select(
            F.floor(F.col("d_obs")).cast("bigint").alias("d_obs_cents"),
            "n_perms",
            "n_exceed",
            F.expr(f"CAST((1 + n_exceed) * 1000000 DIV ({_PERM_K} + 1) AS BIGINT)")
            .alias("p_value_q6"),
        )
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive smoothing (weekly seasonality, shared recursion text)
# ---------------------------------------------------------------------------

# alpha = beta = gamma = 0.5; halving is exact in binary doubles, and the
# recursion text is SHARED verbatim between engines (the _HOLT_CTE
# contract), so every step is bit-identical. The seasonal state rides as
# seven explicit columns s0..s6 (dow = day_ix % 7); each step updates
# exactly one of them. lvl' appears inside trend'/seasonal' — SQL cannot
# reference sibling aliases, so the expression repeats verbatim
# (generated below to keep the two engines' texts identical by
# construction).

_HW_LVL = (
    "(0.5 * (d.x - ({sdow})) + 0.5 * (s.lvl + s.trend))"
)
_HW_SDOW = (
    "CASE CAST(d.day_ix % 7 AS INT) "
    + " ".join(f"WHEN {i} THEN s.s{i}" for i in range(7))
    + " END"
)


def _hw_cte() -> str:
    lvl = _HW_LVL.format(sdow=_HW_SDOW)
    s_updates = ", ".join(
        f"CASE WHEN CAST(d.day_ix % 7 AS INT) = {i} "
        f"THEN 0.5 * (d.x - {lvl}) + 0.5 * s.s{i} ELSE s.s{i} END AS s{i}"
        for i in range(7)
    )
    zeros = ", ".join(f"CAST(0.0 AS DOUBLE) AS s{i}" for i in range(7))
    return f"""
    hw AS (
      SELECT day_ix, x, x AS lvl, CAST(0.0 AS DOUBLE) AS trend, {zeros}
      FROM holt_daily WHERE day_ix = 0
      UNION ALL
      SELECT d.day_ix, d.x,
             {lvl} AS lvl,
             0.5 * ({lvl} - s.lvl) + 0.5 * s.trend AS trend,
             {s_updates}
      FROM hw s JOIN holt_daily d ON d.day_ix = s.day_ix + 1
    )
"""


_HW_SELECT = """
    SELECT day_ix, CAST(x AS BIGINT) AS x_cents,
           CAST(FLOOR(1000000.0 * lvl) AS BIGINT) AS level_q6,
           CAST(FLOOR(1000000.0 * trend) AS BIGINT) AS trend_q6,
           CAST(FLOOR(1000000.0 * (CASE CAST(day_ix % 7 AS INT)
             WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
             WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END)) AS BIGINT) AS seasonal_q6,
           CAST(FLOOR(1000000.0 * (lvl + trend + (CASE CAST((day_ix + 1) % 7 AS INT)
             WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
             WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END))) AS BIGINT)
             AS forecast_next_q6
    FROM hw
"""


def _hw_scan_pdf(pdf):
    """Per-series sequential Holt-Winters scan, bit-identical to the
    generated recursion text (_hw_cte + _HW_SELECT): anchor day_ix = 0
    (lvl = x, trend = 0, s0..s6 = 0), each step walks day_ix + 1 (a gap
    ends the curve like the recursion's equi-join), dow = day_ix % 7,
    and every expression repeats the SQL tree verbatim — including the
    deliberate re-evaluation of lvl' inside trend'/seasonal' (SQL
    cannot reference sibling aliases; same value either way)."""
    import math

    import pandas as pd

    xs = {int(d): float(x) for d, x in zip(pdf["day_ix"], pdf["x"])}
    # non-null invariant of the day grain — same guard and rationale as
    # round8._holt_scan_pdf (ADVICE r15): a NaN daily sum means all-NULL
    # events.value for that day; fail with a defined message instead of
    # math.floor(nan)'s bare ValueError
    bad = sorted(d for d, x in xs.items() if math.isnan(x))
    if bad:
        raise ValueError(
            f"holt-winters day grain violated its non-null invariant: NaN "
            f"daily sum at day_ix={bad} (all-NULL events.value)"
        )
    rows: list[tuple] = []
    if 0 in xs:
        x = xs[0]
        lvl, trend = x, 0.0
        s = [0.0] * 7
        rows.append(
            (
                0,
                int(x),
                math.floor(1000000.0 * lvl),
                math.floor(1000000.0 * trend),
                math.floor(1000000.0 * s[0]),
                math.floor(1000000.0 * (lvl + trend + s[1 % 7])),
            )
        )
        ix = 1
        while ix in xs:
            x = xs[ix]
            dow = ix % 7
            sdow = s[dow]
            # lvl' appears verbatim inside trend'/seasonal' in the SQL;
            # identical inputs through deterministic IEEE ops give the
            # identical value, so evaluate it once
            lvl_expr = 0.5 * (x - sdow) + 0.5 * (lvl + trend)
            new_trend = 0.5 * (lvl_expr - lvl) + 0.5 * trend
            new_s = 0.5 * (x - lvl_expr) + 0.5 * sdow
            lvl, trend, s[dow] = lvl_expr, new_trend, new_s
            rows.append(
                (
                    ix,
                    int(x),
                    math.floor(1000000.0 * lvl),
                    math.floor(1000000.0 * trend),
                    math.floor(1000000.0 * s[dow]),
                    math.floor(1000000.0 * (lvl + trend + s[(ix + 1) % 7])),
                )
            )
            ix += 1
    return pd.DataFrame(
        rows,
        columns=[
            "day_ix",
            "x_cents",
            "level_q6",
            "trend_q6",
            "seasonal_q6",
            "forecast_next_q6",
        ],
    ).astype(
        {
            "day_ix": "int32",
            "x_cents": "int64",
            "level_q6": "int64",
            "trend_q6": "int64",
            "seasonal_q6": "int64",
            "forecast_next_q6": "int64",
        }
    )


_HW_SCAN_SCHEMA = (
    "day_ix int, x_cents bigint, level_q6 bigint, trend_q6 bigint, "
    "seasonal_q6 bigint, forecast_next_q6 bigint"
)


@query(
    "q_holt_winters_additive",
    oracle=f"WITH RECURSIVE holt_daily AS ({_HOLT_DAILY_DUCK}), {_hw_cte()} {_HW_SELECT}",
    tags=("timeseries", "smoothing", "seasonal", "recursive", "round9"),
)
def q_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE (triple exponential) smoothing of daily
    event value with weekly seasonality — level + trend + a seven-slot
    seasonal state vector carried as explicit recursion columns, alpha =
    beta = gamma = 0.5, initialized level = x_0 and zero trend/seasonals
    (the cold-start convention, stated). Completes the smoothing ladder
    over q_ewma_smoothing and q_holt_linear_smoothing; the emitted
    one-step forecast level + trend + next-day seasonal is the
    Holt-Winters forecast equation.

    Exactness: the oracle keeps the recursion text; the Spark side
    evaluates the SAME expression tree (operand order, halvings, one
    FLOOR(1e6 * v) per output — _hw_scan_pdf repeats the generated SQL
    verbatim in Python, whose floats are IEEE binary64 with correctly
    rounded ops), so all 10 state columns evolve bit-identically (the
    q_holt contract, extended to a vector state).

    Scale shape: the recurrence runs on the day grain after one groupBy
    collapses data-scale events (366 steps/year at any SF); sequential
    smoothing is inherently a per-grain scan — at 100 TB only the
    pre-aggregation widens (same envelope as q_holt_linear_smoothing).
    Optimization r15: the WITH RECURSIVE execution planned one join +
    exchange per day (4.1-6.1 s interleaved-A/B leg medians at sf0.1
    for a 30-step series, vs 0.82-0.86 s after); one grouped Arrow
    scan removes that per-iteration overhead, same shape as the
    q_holt_linear_smoothing migration.
    """
    daily = _holt_daily_frame(spark, sf_dir)
    return daily.groupBy(F.lit(1).alias("_series")).applyInPandas(
        _hw_scan_pdf, _HW_SCAN_SCHEMA
    )

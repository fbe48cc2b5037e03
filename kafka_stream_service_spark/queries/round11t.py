"""Round-11 batch 21: preference-strength fitting (Bradley-Terry via
two unrolled MM iterations) and the difference-in-differences estimator
— the pairwise-preference and quasi-experimental legs of the
experimentation tier.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; Bradley-Terry is the model behind preference-pair
reward data (the q_preference_pairs tier's consumer), and DiD is the
standard observational uplift read next to q_cuped_adjustment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Bradley-Terry strengths of event types from daily revenue contests
# ---------------------------------------------------------------------------

# Contests: on each day, type a beats type b if its revenue is strictly
# higher. Two unrolled MM iterations (Hunter 2004): pi_i <- W_i /
# sum_j n_ij/(pi_i + pi_j), starting from pi = 1; every per-j term is
# floor-quantized BEFORE the sum so both engines add identical
# integers, and each iterate is emitted as a q9 integer.


@query(
    "q_bradley_terry",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    wins AS (
      SELECT a.event_type AS i, b.event_type AS j,
             CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ij
      FROM daily a JOIN daily b
        ON a.d = b.d AND a.event_type <> b.event_type
      GROUP BY 1, 2
    ),
    contests AS (
      -- COALESCE: the day-join is symmetric so the reverse row always
      -- exists on this fixture, but a missing reverse duel must mean
      -- "0 reverse wins" in BOTH engines (ADVICE r11), not NULL here
      -- and a dropped row in Spark's join
      SELECT i, j, n_ij, CAST(n_ij + COALESCE((SELECT n_ij FROM wins w2
                WHERE w2.i = wins.j AND w2.j = wins.i), 0) AS BIGINT) AS m_ij
      FROM wins
    ),
    wi AS (
      SELECT i, CAST(SUM(n_ij) AS BIGINT) AS w_i,
             CAST(SUM(m_ij) AS BIGINT) AS t_i
      FROM contests GROUP BY i
    ),
    p1 AS (
      -- iteration 1 from pi = 1: pi_i = W_i / (T_i / 2), quantized q9.
      -- NULLIF: t_i = 0 (a type with contests but no comparable days)
      -- must yield NULL like Spark's DIV, not a division error
      SELECT i, w_i, t_i,
             CAST(2000000000 * w_i // NULLIF(t_i, 0) AS BIGINT) AS p1_q9
      FROM wi
    ),
    den2 AS (
      -- iteration 2 denominator: per-j terms quantized q6 BEFORE sum
      SELECT c.i,
             CAST(SUM(CAST(FLOOR(1000000.0 * c.m_ij * 1000000000.0
                  / (pa.p1_q9 + pb.p1_q9)) AS BIGINT)) AS BIGINT) AS den_q6
      FROM contests c
      JOIN p1 pa ON pa.i = c.i
      JOIN p1 pb ON pb.i = c.j
      GROUP BY c.i
    )
    SELECT p1.i AS event_type, p1.w_i, p1.t_i, p1.p1_q9,
           CAST(FLOOR(1000000000.0 * 1000000.0 * p1.w_i
                / NULLIF(CAST(d.den_q6 AS DOUBLE), 0.0)) AS BIGINT) AS p2_q9
    FROM p1 JOIN den2 d ON d.i = p1.i
    """,
    tags=("stats", "preference", "eval", "llm-data", "round11"),
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths of the five event types from daily
    revenue contests (on each day, a strictly higher-revenue type beats
    a lower one), fitted with two unrolled MM iterations (Hunter 2004:
    pi_i <- W_i / sum_j m_ij/(pi_i + pi_j)) — the model that turns
    pairwise preference counts into a global strength scale, i.e. the
    reward-modeling primitive behind q_preference_pairs' training data.

    Exactness: the wins/contests matrices are exact integers from the
    bounded (day x type) grid; iteration 1 from the all-ones start is
    one integer floor division (2e9*W // T); iteration 2 quantizes each
    per-opponent term m_ij*1e9/(p1_i + p1_j) to q6 BEFORE the sum (the
    per-term recipe — cross-engine addition order never touches
    doubles) and emits one guarded quantized division.

    Scale shape: one (day x type) rollup is the only data-scale stage;
    contests, the MM iterations, and the emission live on the 5-type /
    20-ordered-pair grid.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("bigint").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a = daily.select(
        F.col("event_type").alias("i"), "d", F.col("cents").alias("ca")
    )
    b = daily.select(
        F.col("event_type").alias("j"), "d", F.col("cents").alias("cb")
    )
    wins = (
        a.join(F.broadcast(b), "d")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_ij")
        )
    )
    rev = wins.select(
        F.col("i").alias("j"), F.col("j").alias("i"), F.col("n_ij").alias("n_ji")
    )
    # LEFT join + coalesce(0): a missing reverse duel means "0 reverse
    # wins" (matches the oracle's COALESCE'd correlated lookup) instead
    # of silently dropping the pair on an inner join (ADVICE r11); the
    # symmetric day-join makes this unreachable on the fixture, but the
    # degenerate paths of both plans must agree.
    contests = wins.join(rev, ["i", "j"], "left").select(
        "i",
        "j",
        "n_ij",
        (F.col("n_ij") + F.coalesce(F.col("n_ji"), F.lit(0)))
        .cast("bigint")
        .alias("m_ij"),
    )
    contests = contests.cache()
    wi = contests.groupBy("i").agg(
        F.sum("n_ij").cast("bigint").alias("w_i"),
        F.sum("m_ij").cast("bigint").alias("t_i"),
    )
    p1 = wi.select(
        "i",
        "w_i",
        "t_i",
        F.expr("CAST(2000000000 * w_i DIV NULLIF(t_i, 0) AS BIGINT)").alias("p1_q9"),
    )
    pa = p1.select(F.col("i"), F.col("p1_q9").alias("pa_q9"))
    pb = p1.select(F.col("i").alias("j"), F.col("p1_q9").alias("pb_q9"))
    den2 = (
        contests.join(F.broadcast(pa), "i")
        .join(F.broadcast(pb), "j")
        .groupBy("i")
        .agg(
            F.sum(
                F.floor(
                    F.lit(1000000.0)
                    * F.col("m_ij")
                    * F.lit(1000000000.0)
                    / (F.col("pa_q9") + F.col("pb_q9"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("den_q6")
        )
    )
    return p1.join(F.broadcast(den2), "i").select(
        F.col("i").alias("event_type"),
        "w_i",
        "t_i",
        "p1_q9",
        F.floor(
            F.lit(1000000000.0)
            * F.lit(1000000.0)
            * F.col("w_i")
            / F.nullif(F.col("den_q6").cast("double"), F.lit(0.0))
        )
        .cast("bigint")
        .alias("p2_q9"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences: urgent-priority uplift across the date split
# ---------------------------------------------------------------------------


@query(
    "q_diff_in_differences",
    oracle="""
    WITH x AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS treat,
             CASE WHEN CAST(date_part('year', o_orderdate) AS BIGINT) >= 1996
                  THEN 1 ELSE 0 END AS post,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    cells AS (
      SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM x GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN n END) AS BIGINT) AS n_tp,
        CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN s END) AS BIGINT) AS s_tp,
        CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN n END) AS BIGINT) AS n_t0,
        CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN s END) AS BIGINT) AS s_t0,
        CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN n END) AS BIGINT) AS n_cp,
        CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN s END) AS BIGINT) AS s_cp,
        CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN n END) AS BIGINT) AS n_c0,
        CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN s END) AS BIGINT) AS s_c0
      FROM cells
    )
    SELECT n_tp, n_t0, n_cp, n_c0,
           CAST(FLOOR(100.0 * ((CAST(s_tp AS DOUBLE) / n_tp
                                - CAST(s_t0 AS DOUBLE) / n_t0)
                               - (CAST(s_cp AS DOUBLE) / n_cp
                                  - CAST(s_c0 AS DOUBLE) / n_c0)))
             AS BIGINT) AS did_cents
    FROM wide
    """,
    tags=("stats", "experimentation", "causality", "round11"),
)
def q_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences for the urgent/high-priority "treated"
    orders across the 1996 date split: DiD = (treated post - treated
    pre) - (control post - control pre) on mean order value — the
    parallel-trends uplift read that a naive post-vs-pre or
    treated-vs-control comparison confounds, and the observational
    sibling of q_cuped_adjustment's variance-reduced experiment
    estimator.

    Exactness: the four cell sums/counts are exact integer cents from
    ONE scan; the estimate is a single quantized double tree of the
    four exact means (emitted in hundredths of a cent).

    Scale shape: one scan, one 4-cell rollup, a 1-row emission — the
    minimal possible plan.
    """
    o = tables(spark, sf_dir)["orders"]
    x = o.select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("treat"),
        F.when(F.year("o_orderdate").cast("bigint") >= 1996, 1)
        .otherwise(0)
        .alias("post"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    cells = x.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )

    def cell(t: int, p: int, col: str, alias: str):
        return (
            F.sum(F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col)))
            .cast("bigint")
            .alias(alias)
        )

    wide = cells.agg(
        cell(1, 1, "n", "n_tp"),
        cell(1, 1, "s", "s_tp"),
        cell(1, 0, "n", "n_t0"),
        cell(1, 0, "s", "s_t0"),
        cell(0, 1, "n", "n_cp"),
        cell(0, 1, "s", "s_cp"),
        cell(0, 0, "n", "n_c0"),
        cell(0, 0, "s", "s_c0"),
    )
    return wide.select(
        "n_tp",
        "n_t0",
        "n_cp",
        "n_c0",
        F.floor(
            F.lit(100.0)
            * (
                (
                    F.col("s_tp").cast("double") / F.col("n_tp")
                    - F.col("s_t0").cast("double") / F.col("n_t0")
                )
                - (
                    F.col("s_cp").cast("double") / F.col("n_cp")
                    - F.col("s_c0").cast("double") / F.col("n_c0")
                )
            )
        )
        .cast("bigint")
        .alias("did_cents"),
    )

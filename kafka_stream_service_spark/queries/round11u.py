"""Round-11 batch 22: game-theoretic channel attribution (exact Shapley
values over daily channel-set journeys) and pairwise-majority ranking
(Copeland scores + Condorcet winner) — the cooperative-game and voting
legs of the attribution/preference tier.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; Shapley attribution extends q_attribution_last_touch
with the fair-division answer, and Copeland complements
q_bradley_terry's fitted strengths with the majority-rule ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over (user, day) channel journeys
# ---------------------------------------------------------------------------

# 4 non-purchase channels -> 16 coalitions, enumerated exactly. The
# coalition value v(S) = conversions of journeys whose channel set is
# contained in S (monotone cumulative reach). Shapley weights for n=4
# are the literal s!(3-s)! in 24ths: 6, 2, 2, 6 for |S| = 0..3.
_POPCNT = "((({m}) & 1) + ((({m}) >> 1) & 1) + ((({m}) >> 2) & 1) + ((({m}) >> 3) & 1))"


@query(
    "q_shapley_attribution",
    oracle=f"""
    WITH chan AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
               AS bit_ix
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type <> 'purchase')
    ),
    j AS (
      SELECT e.user_id, date_trunc('day', e.ts) AS d,
             CAST(COALESCE(SUM(DISTINCT CASE WHEN e.event_type <> 'purchase'
                    THEN (CAST(1 AS BIGINT) << c.bit_ix) END), 0) AS BIGINT)
               AS mask,
             MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events e
      LEFT JOIN chan c ON c.event_type = e.event_type
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT mask, CAST(SUM(conv) AS BIGINT) AS conv_t
      FROM j GROUP BY mask
    ),
    masks AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS s),
    v AS (
      SELECT m.s, CAST(COALESCE(SUM(e.conv_t), 0) AS BIGINT) AS v_s
      FROM masks m LEFT JOIN exact e ON (e.mask & m.s) = e.mask
      GROUP BY m.s
    ),
    phi AS (
      SELECT c.event_type, c.bit_ix,
             CAST(SUM((CASE {_POPCNT.format(m="m.s")}
                         WHEN 0 THEN 6 WHEN 1 THEN 2
                         WHEN 2 THEN 2 ELSE 6 END)
                      * (vw.v_s - vo.v_s)) AS BIGINT) AS phi_x24
      FROM chan c
      JOIN masks m ON (m.s & (CAST(1 AS BIGINT) << c.bit_ix)) = 0
      JOIN v vo ON vo.s = m.s
      JOIN v vw ON vw.s = (m.s | (CAST(1 AS BIGINT) << c.bit_ix))
      GROUP BY c.event_type, c.bit_ix
    )
    SELECT p.event_type, p.phi_x24,
           (SELECT v_s FROM v WHERE s = 15) AS v_full,
           (SELECT v_s FROM v WHERE s = 0) AS v_empty
    FROM phi p
    """,
    tags=("stats", "attribution", "game-theory", "eval", "round11"),
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution of purchase conversions to the
    four non-purchase channels: journeys are (user, day) channel SETS,
    the coalition value v(S) counts conversions reachable with channels
    within S (monotone cumulative), and each channel's credit is the
    exact Shapley average of its marginal contributions over all 16
    coalitions — the fair-division answer q_attribution_last_touch's
    heuristic cannot give (last-touch over-credits whatever fires just
    before purchase). Emitted x24 (= 4!) so every value is an exact
    integer; sum(phi_x24) = 24*(v_full - v_empty) by the efficiency
    axiom (pytest-pinned).

    Exactness: channel bits come from an alphabetical rank census
    (identical in both engines); masks, coalition sums, popcount-based
    s!(3-s)! literal weights, and the marginal sums are all pure
    BIGINT arithmetic — no floats anywhere.

    Scale shape: one scan to (user, day) grain (map-side combinable),
    one 16-row exact-set census; coalitions, v, and the Shapley fold
    live on the 16 x 16 literal grid. At 100 TB the only data-scale
    stage is the journey rollup; 2^channels stays literal because
    attribution channel sets are small by design.
    """
    ev = tables(spark, sf_dir)["events"]
    chan = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .withColumn(
            "bit_ix",
            (F.row_number().over(Window.orderBy("event_type")) - 1).cast(
                "bigint"
            ),
        )
    )
    j = (
        ev.join(F.broadcast(chan), "event_type", "left")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.coalesce(
                F.sum_distinct(
                    F.when(
                        F.col("event_type") != "purchase",
                        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit_ix AS INT))"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("mask"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    exact = j.groupBy("mask").agg(F.sum("conv").cast("bigint").alias("conv_t"))
    exact = exact.cache()
    masks = spark.range(0, 16).select(F.col("id").cast("bigint").alias("s"))
    v = (
        masks.join(
            F.broadcast(exact),
            F.expr("(mask & s) = mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv_t"), F.lit(0)).cast("bigint").alias("v_s"))
    )
    v = v.cache()
    popcnt = _POPCNT.format(m="s")
    weight = F.expr(
        f"CASE {popcnt} WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
    )
    vo = v.select(F.col("s").alias("s_wo"), F.col("v_s").alias("v_wo"))
    vw = v.select(F.col("s").alias("s_w"), F.col("v_s").alias("v_w"))
    phi = (
        chan.crossJoin(F.broadcast(masks))
        .filter(F.expr("(s & shiftleft(CAST(1 AS BIGINT), CAST(bit_ix AS INT))) = 0"))
        .withColumn("s_wo", F.col("s"))
        .withColumn(
            "s_w",
            F.expr("s | shiftleft(CAST(1 AS BIGINT), CAST(bit_ix AS INT))"),
        )
        .join(F.broadcast(vo), "s_wo")
        .join(F.broadcast(vw), "s_w")
        .groupBy("event_type", "bit_ix")
        .agg(
            F.sum(weight * (F.col("v_w") - F.col("v_wo")))
            .cast("bigint")
            .alias("phi_x24")
        )
    )
    v_full = v.filter(F.col("s") == 15).select(F.col("v_s").alias("v_full"))
    v_empty = v.filter(F.col("s") == 0).select(F.col("v_s").alias("v_empty"))
    return (
        phi.crossJoin(F.broadcast(v_full))
        .crossJoin(F.broadcast(v_empty))
        .select("event_type", "phi_x24", "v_full", "v_empty")
    )


# ---------------------------------------------------------------------------
# Copeland scores + Condorcet winner over the daily revenue contests
# ---------------------------------------------------------------------------


@query(
    "q_copeland_condorcet",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    duels AS (
      SELECT a.event_type AS i, b.event_type AS j,
             CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END) AS BIGINT)
               AS w_ij,
             CAST(SUM(CASE WHEN a.cents < b.cents THEN 1 ELSE 0 END) AS BIGINT)
               AS l_ij
      FROM daily a JOIN daily b
        ON a.d = b.d AND a.event_type <> b.event_type
      GROUP BY 1, 2
    ),
    cop AS (
      SELECT i AS event_type,
             CAST(SUM(CASE WHEN w_ij > l_ij THEN 1 ELSE 0 END) AS BIGINT)
               AS maj_wins,
             CAST(SUM(CASE WHEN w_ij = l_ij THEN 1 ELSE 0 END) AS BIGINT)
               AS maj_ties,
             CAST(COUNT(*) AS BIGINT) AS n_opponents
      FROM duels GROUP BY i
    )
    SELECT event_type, maj_wins, maj_ties,
           CAST(2 * maj_wins + maj_ties AS BIGINT) AS copeland2,
           CAST(CASE WHEN maj_wins = n_opponents THEN 1 ELSE 0 END AS BIGINT)
             AS is_condorcet
    FROM cop
    """,
    tags=("stats", "preference", "ranking", "round11"),
)
def q_copeland_condorcet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland scores and the Condorcet-winner flag over the same
    daily revenue duels q_bradley_terry fits: an event type's Copeland
    score counts opponents it beats by day-wise MAJORITY (doubled, +1
    per tied duel), and a type beating every opponent head-to-head is
    the Condorcet winner — the voting-theory ranking that needs no
    parametric strength model, the sanity cross-check on the fitted BT
    scale (a BT top-1 that is not the Condorcet winner flags
    intransitive duel structure).

    Exactness: duel tallies, majority verdicts, and the doubled scores
    are pure integers from the bounded (day x type) grid.

    Scale shape: one (day x type) rollup; duels and scores live on the
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
    duels = (
        a.join(F.broadcast(b), "d")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("w_ij"),
            F.sum(F.when(F.col("ca") < F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("l_ij"),
        )
    )
    cop = duels.groupBy(F.col("i").alias("event_type")).agg(
        F.sum(F.when(F.col("w_ij") > F.col("l_ij"), 1).otherwise(0))
        .cast("bigint")
        .alias("maj_wins"),
        F.sum(F.when(F.col("w_ij") == F.col("l_ij"), 1).otherwise(0))
        .cast("bigint")
        .alias("maj_ties"),
        F.count(F.lit(1)).cast("bigint").alias("n_opponents"),
    )
    return cop.select(
        "event_type",
        "maj_wins",
        "maj_ties",
        (2 * F.col("maj_wins") + F.col("maj_ties")).cast("bigint").alias("copeland2"),
        F.when(F.col("maj_wins") == F.col("n_opponents"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_condorcet"),
    )

"""Round-11 batch 11: two-sample distribution distance (Cramer-von
Mises), survival-model discrimination (Harrell's C-index), and lexical
richness (Yule's K + Simpson's D) — each an exact-integer census with
one quantized emission, completing the q_ks_two_sample /
q_kaplan_meier / q_heaps_law_fit families respectively.

Reference parity note: the reference (StreamsApplication.java) is a
Kafka transform pass-through with no statistics surface; these extend
the mandated LLM-data quality/audit tier with exact-arithmetic driver
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Cramer-von Mises two-sample criterion (returned vs kept lineitems)
# ---------------------------------------------------------------------------


@query(
    "q_cramer_von_mises",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS val,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS s1
      FROM lineitem
    ),
    cell AS (
      SELECT val, CAST(SUM(s1) AS BIGINT) AS c1,
             CAST(SUM(1 - s1) AS BIGINT) AS c2
      FROM v GROUP BY val
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM cell
    ),
    cum AS (
      SELECT val, c1 + c2 AS t_u,
             SUM(c1) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
             SUM(c2) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
      FROM cell
    ),
    terms AS (
      SELECT CAST(SUM(CAST(FLOOR(1000000000.0 * c.t_u
               * (CAST(c.f1 * t.n2 - c.f2 * t.n1 AS DOUBLE)
                  / (CAST(t.n1 AS DOUBLE) * t.n2))
               * (CAST(c.f1 * t.n2 - c.f2 * t.n1 AS DOUBLE)
                  / (CAST(t.n1 AS DOUBLE) * t.n2))) AS BIGINT)) AS BIGINT)
             AS sum_terms_q9
      FROM cum c CROSS JOIN tot t
    )
    SELECT t.n1, t.n2, s.sum_terms_q9,
           CAST(FLOOR(CAST(t.n1 AS DOUBLE) * t.n2
                / (CAST(t.n1 + t.n2 AS DOUBLE) * (t.n1 + t.n2))
                * s.sum_terms_q9) AS BIGINT) AS t_q9
    FROM terms s CROSS JOIN tot t
    """,
    tags=("stats", "nonparametric", "two-sample", "drift", "round11"),
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer-von Mises two-sample criterion between the quantity
    distributions of returned (l_returnflag = 'R') and kept lineitems:
    T = (n1*n2/N^2) * sum_u t_u * (F1(u) - F2(u))^2 over the pooled
    value support — the INTEGRATED-squared-ECDF-gap companion to
    q_ks_two_sample's supremum gap (CvM sees distributed small
    departures a single max misses; the classic drift-audit pairing).

    Exactness: per-value cumulative counts are exact BIGINTs from the
    50-cell value census; each term quantizes the single double
    (f1*n2 - f2*n1)/(n1*n2) squared (the products stay < 2^53) to q9
    BEFORE the sum, so the sum is an order-free integer; the final
    n1*n2/N^2 scaling is one more deterministic double op.

    Scale shape: one map-side-combinable census onto the bounded
    quantity domain (<= 50 rows, SF-invariant); the cumulative window
    and everything after run on that grain only.
    """
    li = tables(spark, sf_dir)["lineitem"]
    v = li.select(
        F.col("l_quantity").cast("bigint").alias("val"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("s1"),
    )
    cell = v.groupBy("val").agg(
        F.sum("s1").cast("bigint").alias("c1"),
        F.sum(1 - F.col("s1")).cast("bigint").alias("c2"),
    )
    tot = cell.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    cum = cell.select(
        "val",
        (F.col("c1") + F.col("c2")).alias("t_u"),
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    gap = (F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).cast(
        "double"
    ) / (F.col("n1").cast("double") * F.col("n2"))
    terms = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(F.lit(1000000000.0) * F.col("t_u") * gap * gap).cast("bigint")
        )
        .cast("bigint")
        .alias("sum_terms_q9")
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "sum_terms_q9",
        F.floor(
            F.col("n1").cast("double")
            * F.col("n2")
            / ((F.col("n1") + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2")))
            * F.col("sum_terms_q9")
        )
        .cast("bigint")
        .alias("t_q9"),
    )


# ---------------------------------------------------------------------------
# Harrell's C-index: discrimination of a survival risk score
# ---------------------------------------------------------------------------


@query(
    "q_harrell_c_index",
    oracle="""
    WITH dur AS (
      SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS t_days,
             CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END AS ev,
             CAST(6 - CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT)
                  AS BIGINT) AS risk
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    g AS (
      SELECT t_days, ev, risk, CAST(COUNT(*) AS BIGINT) AS c
      FROM dur GROUP BY t_days, ev, risk
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN a.risk > b.risk THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN a.risk < b.risk THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS disc,
             CAST(SUM(CASE WHEN a.risk = b.risk THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS tied_risk
      FROM g a JOIN g b ON a.ev = 1 AND a.t_days < b.t_days
    )
    SELECT conc, disc, tied_risk,
           CAST(FLOOR(1000000000.0 * (2.0 * conc + tied_risk)
                / NULLIF(2.0 * (conc + disc + tied_risk), 0.0)) AS BIGINT)
             AS c_index_q9
    FROM pairs
    """,
    tags=("stats", "survival", "eval", "round11"),
)
def q_harrell_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's concordance index for the order-priority risk score
    against the censored ship-duration outcome (q_kaplan_meier's
    durations and censoring, exactly): over usable pairs — an earlier
    OBSERVED event vs any later survivor — how often does the
    higher-risk member (more urgent priority, score 6-p) actually ship
    first? C = (concordant + ties/2) / usable, the survival tier's
    standard discrimination metric (0.5 = random, 1 = perfect). Pairs
    tied on duration are excluded (the strict-inequality convention;
    stated here because conventions differ on that corner).

    Exactness: all pair counts are exact BIGINT products summed from
    the (duration x risk x event) census; C is one quantized double
    division (counts reach N^2/2 and the q9 scaling would cross 2^63
    as integers, hence the double).

    Scale shape: one orderkey-partitioned join to the census, then
    LINEAR pair counting — per risk, a suffix-sum window gives
    later(t, r) = #items outliving day t, and each event cell joins
    its day's 5 later values, so the work is O(census x risks), never
    a census self-join. (The first cut here DID self-join the grid on
    ta < tb under a "days are bounded" assumption the fixture's ~4.7k
    distinct durations immediately falsified: 16.7 s at sf0.1 and
    quadratic in the duration domain; this form measures 1.1 s and is
    the one a 100 TB duration domain tolerates. The oracle is
    unchanged — the hash verdict certifies the rewrite.)
    """
    t = tables(spark, sf_dir)
    dur = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("t_days"),
            (F.col("l_returnflag") != "R").cast("int").alias("ev"),
            (6 - F.substring("o_orderpriority", 1, 1).cast("bigint"))
            .cast("bigint")
            .alias("risk"),
        )
    )
    g = dur.groupBy("t_days", "ev", "risk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    g = g.cache()
    # later(t, rb): items of risk rb with duration strictly > t, via a
    # per-risk suffix sum over the FULL day x risk grid (zero-filled so
    # days where a risk has no items still carry its suffix count).
    days = g.select("t_days").distinct()
    risks = g.select(F.col("risk").alias("rb")).distinct()
    c_all = g.groupBy("t_days", "risk").agg(F.sum("c").cast("bigint").alias("c_tr"))
    grid = (
        days.crossJoin(F.broadcast(risks))
        .join(
            c_all.withColumnRenamed("risk", "rb"),
            ["t_days", "rb"],
            "left",
        )
        .select("t_days", "rb", F.coalesce("c_tr", F.lit(0)).alias("c_tr"))
    )
    w_later = (
        Window.partitionBy("rb")
        .orderBy(F.desc("t_days"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    later = grid.select(
        "t_days",
        "rb",
        F.coalesce(F.sum("c_tr").over(w_later), F.lit(0))
        .cast("bigint")
        .alias("later_cnt"),
    )
    ev_cells = g.filter(F.col("ev") == 1).select(
        "t_days", F.col("risk").alias("ra"), F.col("c").alias("ca")
    )
    pairs = ev_cells.join(later, "t_days").agg(
        F.sum(
            F.when(F.col("ra") > F.col("rb"), F.col("ca") * F.col("later_cnt"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("conc"),
        F.sum(
            F.when(F.col("ra") < F.col("rb"), F.col("ca") * F.col("later_cnt"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("disc"),
        F.sum(
            F.when(F.col("ra") == F.col("rb"), F.col("ca") * F.col("later_cnt"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("tied_risk"),
    )
    return pairs.select(
        "conc",
        "disc",
        "tied_risk",
        F.floor(
            F.lit(1000000000.0)
            * (F.lit(2.0) * F.col("conc") + F.col("tied_risk"))
            / F.nullif(
                F.lit(2.0) * (F.col("conc") + F.col("disc") + F.col("tied_risk")),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("c_index_q9"),
    )


# ---------------------------------------------------------------------------
# Yule's K + Simpson's D: lexical richness of the corpus
# ---------------------------------------------------------------------------


@query(
    "q_yule_k_lexical",
    oracle="""
    WITH toked AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM toked GROUP BY w),
    agg AS (
      SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS v_types,
             CAST(SUM(f * f) AS BIGINT) AS s2
      FROM freq
    )
    SELECT n_tokens, v_types, s2,
           CAST(FLOOR(1000000.0 * 10000.0 * CAST(s2 - n_tokens AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE) * n_tokens)) AS BIGINT)
             AS yule_k_q6,
           CAST(FLOOR(1000000000.0 * CAST(s2 - n_tokens AS DOUBLE)
                / NULLIF(CAST(n_tokens AS DOUBLE) * (n_tokens - 1), 0.0))
                AS BIGINT) AS simpson_d_q9
    FROM agg
    """,
    tags=("text", "lexical", "quality", "llm-data", "round11"),
)
def q_yule_k_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K and Simpson's D over the corpus unigram
    frequencies — the repetitiveness-of-vocabulary constants that stay
    comparable across corpus sizes (unlike raw type/token ratio):
    K = 10^4 * (sum_m m^2 V_m - N) / N^2 via the identity
    sum_m m^2 V_m = sum_w f_w^2, and D = sum_w f_w(f_w - 1) / (N(N-1))
    — the probability two random tokens are the same type. The pair
    completes the lexical tier next to q_heaps_law_fit (vocabulary
    growth) and q_zipf_law_fit (rank-frequency shape); a K spike is
    the classic template-spam signal in web-corpus curation.

    Exactness: N, V and the sum of squared frequencies are exact
    BIGINTs from one word rollup; both constants are single quantized
    doubles of those integers.

    Scale shape: explode -> ONE map-side-combinable word rollup ->
    1-row global fold; no windows, no joins, nothing above word grain.
    """
    d = tables(spark, sf_dir)["documents"]
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    agg = freq.agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("s2"),
    )
    return agg.select(
        "n_tokens",
        "v_types",
        "s2",
        F.floor(
            F.lit(1000000.0)
            * F.lit(10000.0)
            * (F.col("s2") - F.col("n_tokens")).cast("double")
            / (F.col("n_tokens").cast("double") * F.col("n_tokens"))
        )
        .cast("bigint")
        .alias("yule_k_q6"),
        F.floor(
            F.lit(1000000000.0)
            * (F.col("s2") - F.col("n_tokens")).cast("double")
            / F.nullif(
                F.col("n_tokens").cast("double") * (F.col("n_tokens") - 1),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("simpson_d_q9"),
    )

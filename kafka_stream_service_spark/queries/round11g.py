"""Round-11 batch 7: sequential experimentation (Wald's SPRT) and the
bigram conditional-entropy rate — both exact-integer via Python-literal
log constants / per-type quantization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Wald's SPRT on the daily purchase-conversion rate
# ---------------------------------------------------------------------------

# H0: p = 0.18 vs H1: p = 0.22 (the fixture's purchase share is ~0.20,
# so the walk hovers between the boundaries — both branches exercise).
# All four log constants are PYTHON-computed q9 integer literals, so the
# per-day increment is pure integer arithmetic on both engines.
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_ALPHA = _SPRT_BETA = 0.05
_L1_Q9 = int(math.floor(1e9 * math.log(_SPRT_P1 / _SPRT_P0)))          # per success
_L0_Q9 = int(math.floor(1e9 * math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))))  # per failure
_UPPER_Q9 = int(math.floor(1e9 * math.log((1 - _SPRT_BETA) / _SPRT_ALPHA)))
_LOWER_Q9 = int(math.floor(1e9 * math.log(_SPRT_BETA / (1 - _SPRT_ALPHA))))


@query(
    "q_sprt_conversion",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    walk AS (
      SELECT d, k, n,
             CAST(SUM(k * ({_L1_Q9}) + (n - k) * ({_L0_Q9}))
                  OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS llr_q9
      FROM daily
    )
    SELECT d, k, n, llr_q9,
           CAST(CASE WHEN llr_q9 >= {_UPPER_Q9} THEN 1
                     WHEN llr_q9 <= {_LOWER_Q9} THEN -1
                     ELSE 0 END AS INT) AS decision
    FROM walk
    """,
    tags=("stats", "experimentation", "sequential", "timeseries", "round11"),
)
def q_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily purchase
    conversion rate — the always-valid sequential companion to the
    fixed-horizon tests (Welch, permutation): H0 p={_SPRT_P0} vs H1
    p={_SPRT_P1} at alpha=beta={_SPRT_ALPHA}. Each day appends
    k*ln(p1/p0) + (n-k)*ln(q1/q0) to the log-likelihood walk; crossing
    ln((1-b)/a) accepts H1 (+1), crossing ln(b/(1-a)) accepts H0 (-1),
    else the experiment continues (0) — per-day rows expose the whole
    trajectory, the shape an experimentation platform stores.

    Exactness: all four log constants are PYTHON-computed q9 integer
    literals baked into both plans; daily counts are exact integers, so
    the walk is an exact integer prefix sum and the decisions are
    integer comparisons — no float anywhere at query time.

    Scale shape: one day-grain rollup (map-side combinable), one prefix
    window over the bounded day census.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walk = daily.withColumn(
        "llr_q9",
        F.sum(
            F.col("k") * F.lit(_L1_Q9) + (F.col("n") - F.col("k")) * F.lit(_L0_Q9)
        )
        .over(w)
        .cast("bigint"),
    )
    return walk.select(
        "d",
        "k",
        "n",
        "llr_q9",
        F.when(F.col("llr_q9") >= _UPPER_Q9, 1)
        .when(F.col("llr_q9") <= _LOWER_Q9, -1)
        .otherwise(0)
        .cast("int")
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# Bigram conditional-entropy rate H(w2 | w1)
# ---------------------------------------------------------------------------


@query(
    "q_entropy_rate_bigram",
    oracle="""
    WITH toked AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
      SELECT u.g[1] AS w1, u.g[2] AS w2
      FROM toked, unnest(list_transform(
             range(1, greatest(len(toks) - 1, 0) + 1),
             i -> [toks[i], toks[i + 1]])) AS u(g)
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
    terms AS (
      SELECT b.w1, c1.c1,
             CAST(FLOOR(1000000000.0 * (CAST(b.c12 AS DOUBLE) / c1.c1)
                  * (-ln(CAST(b.c12 AS DOUBLE) / c1.c1))) AS BIGINT) AS t_q9
      FROM c12 b JOIN c1 USING (w1)
    ),
    perctx AS (
      SELECT w1, CAST(MAX(c1) AS BIGINT) AS c1,
             CAST(SUM(t_q9) AS BIGINT) AS h_ctx_q9
      FROM terms GROUP BY w1
    )
    SELECT w1, c1, h_ctx_q9,
           CAST(SUM(h_ctx_q9 * c1) OVER () // SUM(c1) OVER ()
                AS BIGINT) AS h_rate_q9
    FROM perctx
    """,
    tags=("text", "entropy", "language-model", "llm-data", "round11"),
)
def q_entropy_rate_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-entropy rate: per left-context w1, the entropy
    H(w2|w1) of what follows, plus the corpus entropy RATE (the
    context-frequency-weighted average) — the information-theoretic
    ceiling on next-token predictability a 1-gram-context model can
    achieve (low per-context entropy marks templated continuations,
    which is why entropy rate drops under heavy duplication; pairs with
    q_text_repetition and the Zipf/Heaps census).

    Exactness: each term p(w2|w1) * -ln p(w2|w1) floor-quantizes per
    bigram TYPE (exact integer counts into one IEEE-identical double),
    so per-context entropies are order-free integer sums; the rate is
    one integer floor division of exact weighted sums.

    Scale shape: one bigram rollup + context rollup (vocabulary
    grain); the window-over-all runs on the bounded context census.
    """
    d = tables(spark, sf_dir)["documents"]
    toked = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    bg = toked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda i: F.struct(
                    F.try_element_at(F.col("toks"), i.cast("int")).alias("w1"),
                    F.try_element_at(F.col("toks"), (i + 1).cast("int")).alias("w2"),
                ),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    p = F.col("c12").cast("double") / F.col("c1")
    terms = c12.join(F.broadcast(c1), "w1").select(
        "w1",
        "c1",
        F.floor(F.lit(1000000000.0) * p * (-F.log(p))).cast("bigint").alias("t_q9"),
    )
    perctx = terms.groupBy("w1").agg(
        F.max("c1").cast("bigint").alias("c1"),
        F.sum("t_q9").cast("bigint").alias("h_ctx_q9"),
    )
    return perctx.select(
        "w1",
        "c1",
        "h_ctx_q9",
        F.expr(
            "CAST(SUM(h_ctx_q9 * c1) OVER () DIV SUM(c1) OVER () AS BIGINT)"
        ).alias("h_rate_q9"),
    )

"""Round-11 batch 23: Holm-Bonferroni step-down over the per-source
permutation-test family — the FWER companion of q_benjamini_hochberg's
FDR step-up, on provably the SAME p-values (round11i.pv_cte_sql): the
pairing a curation-audit report shows side by side (Holm for "no false
alarm at all", BH for "bounded false-alarm share").

Reference parity note: the reference (StreamsApplication.java) has no
statistics surface; this completes the mandated multiple-testing tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .round11i import _BH_K, pv_cte_sql, q_benjamini_hochberg


@query(
    "q_holm_bonferroni",
    oracle=f"""
    WITH {pv_cte_sql()},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pv),
    ranked AS (
      SELECT pv.source, pv.n_s, pv.p_num, m.m,
             CAST(ROW_NUMBER() OVER (ORDER BY pv.p_num, pv.source) AS BIGINT)
               AS rnk
      FROM pv CROSS JOIN m
    ),
    crit AS (
      -- Holm criterion at alpha = 0.1: p_(i) <= alpha/(m - i + 1)
      -- becomes the integer inequality 10 * p_num * (m - rnk + 1)
      -- <= (K + 1)
      SELECT *, CASE WHEN 10 * p_num * (m - rnk + 1) <= {_BH_K} + 1
                     THEN 1 ELSE 0 END AS ok
      FROM ranked
    ),
    stop AS (
      SELECT COALESCE(MIN(CASE WHEN ok = 0 THEN rnk END), m + 1) AS first_fail
      FROM crit GROUP BY m
    )
    SELECT c.source, c.n_s, c.p_num,
           CAST({_BH_K} AS BIGINT) AS n_perms, c.rnk, c.m,
           CAST(c.ok AS BIGINT) AS holm_ok,
           CAST(CASE WHEN c.rnk < s.first_fail THEN 1 ELSE 0 END AS BIGINT)
             AS rejected
    FROM crit c CROSS JOIN stop s
    """,
    tags=("stats", "hypothesis-test", "multiple-testing", "fwer", "round11"),
)
def q_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni (1979) step-down over the SAME per-source
    permutation family as q_benjamini_hochberg (its Spark plan is
    literally reused up to the p-value frame): rank the m p-values
    ascending and reject while p_(i) <= alpha/(m - i + 1), STOPPING at
    the first failure — uniform FWER control where BH bounds only the
    false-discovery share. A source rejected by Holm survives the
    strictest reading; BH-only rejections are the "worth a look"
    middle tier.

    Exactness: p-values are the exact Dwass integer numerators; the
    Holm criterion is the integer inequality 10*p_num*(m-rnk+1) <=
    K+1; the stop rank is an integer MIN with an m+1 sentinel when
    nothing fails.

    Scale shape: identical to BH — the relabeling grid is the only
    data-scale stage (corpus x m x K map-side-combinable partials);
    the step-down runs on the m-row family.
    """
    # reuse BH's certified plan up to the ranked p-value frame
    bh = q_benjamini_hochberg(spark, sf_dir).select(
        "source", "n_s", "p_num", "n_perms", "rnk", "m"
    )
    crit = bh.withColumn(
        "ok",
        F.when(
            10 * F.col("p_num") * (F.col("m") - F.col("rnk") + 1) <= _BH_K + 1,
            1,
        ).otherwise(0),
    )
    # the stop scalar re-aggregates crit; caching the m-row frame keeps
    # the relabeling grid (the only data-scale stage) to ONE pass
    crit = crit.cache()
    stop = crit.agg(
        F.coalesce(
            F.min(F.when(F.col("ok") == 0, F.col("rnk"))),
            (F.max("m") + 1).cast("bigint"),
        ).alias("first_fail")
    )
    return crit.crossJoin(F.broadcast(stop)).select(
        "source",
        "n_s",
        "p_num",
        "n_perms",
        "rnk",
        "m",
        F.col("ok").cast("bigint").alias("holm_ok"),
        F.when(F.col("rnk") < F.col("first_fail"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )

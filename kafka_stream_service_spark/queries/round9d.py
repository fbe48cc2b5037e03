"""Round-9 operator batch 4: the curation CAPSTONE — per-source
sampling weights composed from the quality-rule census, the perplexity
buckets, and temperature smoothing.

This is the end-to-end decision real corpus pipelines actually ship:
after dedup, rules, and perplexity scoring, each SOURCE gets a sampling
weight for the training mixture. The composition here is the standard
recipe: quality = (Gopher pass rate) x (CCNet head fraction), effective
mass = n_docs x quality, then temperature smoothing mass^alpha
(alpha = 0.3, the XLM-R/mC4 exponent q_temperature_mixing documents)
normalized into millionth shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query
from .round9 import _CCNET_CTES, _GOPHER_CTES, _ccnet_bucketed, _gopher_flags


@query(
    "q_curation_mixture",
    oracle=f"""
    WITH {_CCNET_CTES},
    {_GOPHER_CTES},
    census AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(r_wordcount * r_meanwordlen * r_stopwords
                      * r_diversity * r_domination) AS BIGINT) AS n_pass
      FROM flags GROUP BY source
    ),
    heads AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_head
      FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
      WHERE r.rnk * 3 <= r.n_total
      GROUP BY d.source
    ),
    q AS (
      SELECT c.source, c.n_docs, c.n_pass,
             COALESCE(h.n_head, 0) AS n_head,
             CAST(c.n_pass * COALESCE(h.n_head, 0) * 1000000
                  // (c.n_docs * c.n_docs) AS BIGINT) AS quality_q6
      FROM census c LEFT JOIN heads h ON h.source = c.source
    ),
    wq AS (  -- exp/ln once per SOURCE (<= source-count types), quantized
      SELECT q.*,
             CASE WHEN n_docs * quality_q6 > 0
                  THEN CAST(FLOOR(1000000 * exp(0.3
                         * ln(CAST(n_docs * quality_q6 AS DOUBLE)))) AS BIGINT)
                  ELSE 0 END AS w_q6
      FROM q
    ),
    tot AS (SELECT CAST(SUM(w_q6) AS BIGINT) AS tw FROM wq)
    SELECT source, n_docs, n_pass, n_head, quality_q6, w_q6,
           CAST(CASE WHEN tot.tw > 0 THEN w_q6 * 1000000 // tot.tw
                ELSE 0 END AS BIGINT) AS share_q6
    FROM wq CROSS JOIN tot
    """,
    tags=("text", "quality", "llm-data", "curation", "mixture", "round9"),
)
def q_curation_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation mixture: per-source training-sampling shares
    composed from the whole round-9 curation stack — quality =
    (Gopher-census pass rate) x (CCNet head-bucket fraction), effective
    mass = n_docs x quality, temperature-smoothed mass^0.3 (the
    q_temperature_mixing recipe), normalized to millionth shares. The
    decision output a corpus pipeline feeds its data loader.

    Exactness: pass/head counts are integers from the shared plan
    bodies (_gopher_flags, _ccnet_bucketed — the SAME code the component
    queries run, so this capstone can never drift from them);
    quality_q6 is one integer floor division; exp(0.3*ln(mass)) is
    computed once per SOURCE and floor-quantized before the integer
    normalization (the q_temperature_mixing transcendental contract);
    shares are integer floor divisions of quantized weights.

    Overflow envelope (documented-envelope standard, ADVICE r8/r9):
    quality_q6's numerator n_pass*n_head*1e6 is bounded by n_docs^2*1e6
    — BIGINT-safe while any single source holds < ~3e6 docs; and the
    share numerator w_q6*1e6 with w_q6 ~ 1e6*(n_docs*1e6)^0.3 is
    BIGINT-safe to ~4e13 docs/source. Past the first bound, widen
    quality_q6's numerator to DECIMAL(38,0)/HUGEINT (both engines
    support integer DIV there) — at which point the exp/ln weight leg,
    already double-based, is the binding precision term, not the
    integer legs.

    Scale shape: everything rides the component plans (one scan + bounded
    broadcasts + the distributed rank); the composition itself touches
    only source-grain rows (tens), joined by broadcast.
    """
    flags = _gopher_flags(spark, sf_dir)
    census = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.col("r_wordcount")
            * F.col("r_meanwordlen")
            * F.col("r_stopwords")
            * F.col("r_diversity")
            * F.col("r_domination")
        )
        .cast("bigint")
        .alias("n_pass"),
    )
    buckets = _ccnet_bucketed(spark, sf_dir)
    src = tables(spark, sf_dir)["documents"].select("doc_id", "source")
    heads = (
        buckets.filter(F.col("bucket") == "head")
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_head"))
    )
    q = census.join(F.broadcast(heads), "source", "left").select(
        "source",
        "n_docs",
        "n_pass",
        F.coalesce("n_head", F.lit(0).cast("bigint")).alias("n_head"),
        F.expr(
            "CAST(n_pass * COALESCE(n_head, 0) * 1000000 DIV (n_docs * n_docs) AS BIGINT)"
        ).alias("quality_q6"),
    )
    wq = q.select(
        "*",
        F.when(
            F.col("n_docs") * F.col("quality_q6") > 0,
            F.floor(
                F.lit(1000000)
                * F.exp(
                    F.lit(0.3)
                    * F.log((F.col("n_docs") * F.col("quality_q6")).cast("double"))
                )
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("w_q6"),
    )
    tot = wq.agg(F.sum("w_q6").cast("bigint").alias("tw"))
    return wq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_pass",
        "n_head",
        "quality_q6",
        "w_q6",
        F.expr("CAST(CASE WHEN tw > 0 THEN w_q6 * 1000000 DIV tw ELSE 0 END AS BIGINT)")
        .alias("share_q6"),
    )

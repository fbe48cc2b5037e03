"""Round-11 batch 13: directional association (Theil's uncertainty
coefficient), corpus stylometry (Burrows' Delta between sources), and
annotation-reliability (Krippendorff's alpha) — the remaining named
metrics of the association/agreement tier, each an exact-integer census
with per-term quantization.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; these extend the mandated LLM-data curation-audit
tier (source attribution, annotator QC, drift direction) with
exact-arithmetic driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Theil's uncertainty coefficient U(lang | source)
# ---------------------------------------------------------------------------


@query(
    "q_theils_u",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM documents GROUP BY lang, source
    ),
    mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY lang),
    my AS (SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY source),
    h AS (
      SELECT CAST(SUM(mx.n_x * CAST(FLOOR(1000000.0 * LN(
               CAST(n.n AS DOUBLE) / CAST(mx.n_x AS DOUBLE))) AS BIGINT))
             AS BIGINT) AS h_lang_qsum
      FROM mx CROSS JOIN n
    ),
    mi AS (
      SELECT CAST(SUM(c.n_xy * CAST(FLOOR(1000000.0 * LN(
               (CAST(c.n_xy AS DOUBLE) * CAST(n.n AS DOUBLE))
               / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)))) AS BIGINT))
             AS BIGINT) AS mi_qsum
      FROM cells c JOIN mx ON mx.lang = c.lang
                   JOIN my ON my.source = c.source CROSS JOIN n
    )
    SELECT h.h_lang_qsum, mi.mi_qsum,
           CAST(FLOOR(1000000000.0 * CAST(mi.mi_qsum AS DOUBLE)
                / NULLIF(CAST(h.h_lang_qsum AS DOUBLE), 0.0)) AS BIGINT)
             AS theils_u_q9
    FROM h CROSS JOIN mi
    """,
    tags=("stats", "association", "information-theory", "drift", "round11"),
)
def q_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(lang | source) = I(lang;source)
    / H(lang) — the DIRECTIONAL association q_mutual_information and
    q_cramers_v both lack: "what fraction of language uncertainty does
    knowing the source remove?", asymmetric by construction (U(y|x) !=
    U(x|y)), the right alarm for "is this source a language silo".

    Exactness: both entropies follow the repo's ln recipe — quantize
    ln per TYPE to q6 before the integer-weighted sum, so
    N*1e6*H(lang) and N*1e6*I are exact order-free integers from the
    same marginals; U is one quantized double ratio of the two (the N
    and 1e6 factors cancel).

    Scale shape: ONE joint rollup bounded by |langs| x |sources|;
    marginals are rollups of the cells; the ratio is a 1-row fold.
    """
    d = tables(spark, sf_dir)["documents"]
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    )
    n = cells.agg(F.sum("n_xy").cast("bigint").alias("n"))
    mx = cells.groupBy("lang").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    my = cells.groupBy("source").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    h = (
        mx.crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.col("n_x")
                * F.floor(
                    F.lit(1000000.0)
                    * F.log(F.col("n").cast("double") / F.col("n_x").cast("double"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("h_lang_qsum")
        )
    )
    mi = (
        cells.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.col("n_xy")
                * F.floor(
                    F.lit(1000000.0)
                    * F.log(
                        (F.col("n_xy").cast("double") * F.col("n").cast("double"))
                        / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("mi_qsum")
        )
    )
    return h.crossJoin(F.broadcast(mi)).select(
        "h_lang_qsum",
        "mi_qsum",
        F.floor(
            F.lit(1000000000.0)
            * F.col("mi_qsum").cast("double")
            / F.nullif(F.col("h_lang_qsum").cast("double"), F.lit(0.0))
        )
        .cast("bigint")
        .alias("theils_u_q9"),
    )


# ---------------------------------------------------------------------------
# Burrows' Delta: stylometric distance between sources
# ---------------------------------------------------------------------------

_DELTA_M = 20  # marker words: the M most frequent corpus-wide


@query(
    "q_burrows_delta",
    oracle=f"""
    WITH toked AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toked GROUP BY source, w
    ),
    toks AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM sw GROUP BY source),
    top AS (
      SELECT w FROM (
        SELECT w, CAST(SUM(c) AS BIGINT) AS ctot FROM sw GROUP BY w
      ) ORDER BY ctot DESC, w LIMIT {_DELTA_M}
    ),
    grid AS (
      SELECT toks.source, top.w, toks.t, COALESCE(sw.c, 0) AS c
      FROM toks CROSS JOIN top
      LEFT JOIN sw ON sw.source = toks.source AND sw.w = top.w
    ),
    fq AS (
      SELECT source, w,
             CAST(FLOOR(1000000.0 * CAST(c AS DOUBLE) / t) AS BIGINT) AS f_q6
      FROM grid
    ),
    ws AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(f_q6) AS BIGINT) AS sf,
             CAST(SUM(f_q6 * f_q6) AS BIGINT) AS sf2
      FROM fq GROUP BY w
    ),
    z AS (
      SELECT fq.source, fq.w,
             CAST(FLOOR(1000000.0 * CAST(ws.s * fq.f_q6 - ws.sf AS DOUBLE)
                  / NULLIF(SQRT(CAST(ws.s * ws.sf2 - ws.sf * ws.sf AS DOUBLE)),
                           0.0)) AS BIGINT) AS z_q6
      FROM fq JOIN ws ON ws.w = fq.w
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(ABS(a.z_q6 - b.z_q6)) AS BIGINT) AS delta_sum_q6,
           CAST(SUM(ABS(a.z_q6 - b.z_q6)) // {_DELTA_M} AS BIGINT) AS delta_q6
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    tags=("text", "stylometry", "similarity", "llm-data", "round11"),
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (2002) between every pair of sources: z-score the
    relative frequency of the 20 corpus-wide marker words within each
    source (mean/std taken ACROSS sources per word), then Delta =
    mean |z_a - z_b| over the markers — the classic stylometric
    "same author / same template family?" distance, used in curation to
    spot sources that are re-skins of one another. Zero cells count
    (a source missing a marker word is stylometric signal, not missing
    data).

    Exactness: relative frequencies quantize to exact q6 integers per
    (source, word); per-word cross-source moments S*f - sum(f) and
    S*sum(f^2) - sum(f)^2 are exact BIGINTs (q6 keeps every product
    under 2^53); each z is one quantized double (NULLIF guards a
    zero-variance marker); Delta sums quantized integers order-free
    and the final /M is an integer floor division of non-negatives.

    Scale shape: one (source, word) rollup is the only data-scale
    stage; the marker list is a TakeOrdered(20) of the word rollup;
    everything downstream lives on the sources x 20 grid and its
    190-pair self-join — SF-invariant.
    """
    d = tables(spark, sf_dir)["documents"]
    sw = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sw = sw.cache()
    toks = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    top = (
        sw.groupBy("w")
        .agg(F.sum("c").cast("bigint").alias("ctot"))
        .orderBy(F.desc("ctot"), "w")
        .limit(_DELTA_M)
        .select("w")
    )
    grid = (
        toks.crossJoin(F.broadcast(top))
        .join(F.broadcast(sw), ["source", "w"], "left")
        .select("source", "w", "t", F.coalesce("c", F.lit(0)).alias("c"))
    )
    fq = grid.select(
        "source",
        "w",
        F.floor(F.lit(1000000.0) * F.col("c").cast("double") / F.col("t"))
        .cast("bigint")
        .alias("f_q6"),
    )
    ws = fq.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("s"),
        F.sum("f_q6").cast("bigint").alias("sf"),
        F.sum(F.col("f_q6") * F.col("f_q6")).cast("bigint").alias("sf2"),
    )
    z = fq.join(F.broadcast(ws), "w").select(
        "source",
        "w",
        F.floor(
            F.lit(1000000.0)
            * (F.col("s") * F.col("f_q6") - F.col("sf")).cast("double")
            / F.nullif(
                F.sqrt(
                    (
                        F.col("s") * F.col("sf2") - F.col("sf") * F.col("sf")
                    ).cast("double")
                ),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("z_q6"),
    )
    za = z.select(
        F.col("source").alias("source_a"), "w", F.col("z_q6").alias("z_a")
    )
    zb = z.select(
        F.col("source").alias("source_b"), "w", F.col("z_q6").alias("z_b")
    )
    return (
        za.join(F.broadcast(zb), "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("z_a") - F.col("z_b")))
            .cast("bigint")
            .alias("delta_sum_q6"),
            F.expr(
                f"CAST(SUM(ABS(z_a - z_b)) DIV {_DELTA_M} AS BIGINT)"
            ).alias("delta_q6"),
        )
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (binary, 3 raters, no missing values)
# ---------------------------------------------------------------------------

from .round11c import _FILTER_A_SQL, _FILTER_B_SQL  # noqa: E402
from .round11e import _FILTER_C_SQL  # noqa: E402


@query(
    "q_krippendorff_alpha",
    oracle=f"""
    WITH verdicts AS (
      SELECT CAST(CASE WHEN {_FILTER_A_SQL} THEN 1 ELSE 0 END
                + CASE WHEN {_FILTER_B_SQL} THEN 1 ELSE 0 END
                + CASE WHEN {_FILTER_C_SQL} THEN 1 ELSE 0 END AS BIGINT) AS np
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(np) AS BIGINT) AS t_pass,
             CAST(SUM(np * (3 - np)) AS BIGINT) AS s_disagree
      FROM verdicts
    )
    SELECT n, t_pass, s_disagree,
           CAST(FLOOR(1000000000.0
             * (2.0 * CAST(t_pass AS DOUBLE) * (3 * n - t_pass)
                - CAST(s_disagree AS DOUBLE) * (3 * n - 1))
             / NULLIF(2.0 * CAST(t_pass AS DOUBLE) * (3 * n - t_pass), 0.0))
             AS BIGINT) AS alpha_q9
    FROM agg
    """,
    tags=("stats", "agreement", "quality", "llm-data", "round11"),
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha for the three-filter annotation panel
    (binary, complete data): alpha = 1 - Do/De with observed
    disagreement Do counted over within-document rater pairs and
    expected disagreement De over ALL value pairs — unlike
    q_fleiss_kappa's kappa, alpha's chance term uses the finite-sample
    (3N - 1) pairing, making it the small-N-honest reliability number
    annotation-QC pipelines report. For binary data with pass counts
    np: Do proportional to sum np*(3 - np) and alpha reduces to
    1 - s_disagree*(3N - 1) / (2*Tp*Tf).

    Exactness: the pass-count rollup gives exact integers N, Tp, and
    sum np*(3-np); alpha is one quantized double of their products
    (each < 2^53 at fixture SFs; DECIMAL(38,0) is the documented
    petabyte path, as in q_fleiss_kappa).

    Scale shape: ONE corpus scan, one global map-side-combinable
    rollup, a 1-row emission — identical to q_fleiss_kappa's plan.
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to")])
    np_ = (
        ((F.size(toks) >= 20) & (F.size(toks) <= 90)).cast("bigint")
        + (2 * F.size(F.array_distinct(toks)) >= F.size(toks)).cast("bigint")
        + (F.size(F.array_intersect(F.array_distinct(toks), stop)) >= 2).cast(
            "bigint"
        )
    )
    agg = d.select(np_.alias("np")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("np").cast("bigint").alias("t_pass"),
        F.sum(F.col("np") * (3 - F.col("np"))).cast("bigint").alias("s_disagree"),
    )
    return agg.select(
        "n",
        "t_pass",
        "s_disagree",
        F.floor(
            F.lit(1000000000.0)
            * (
                F.lit(2.0)
                * F.col("t_pass").cast("double")
                * (3 * F.col("n") - F.col("t_pass"))
                - F.col("s_disagree").cast("double") * (3 * F.col("n") - 1)
            )
            / F.nullif(
                F.lit(2.0)
                * F.col("t_pass").cast("double")
                * (3 * F.col("n") - F.col("t_pass")),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("alpha_q9"),
    )

"""Model-evaluation / dataset-split operators (round 6 extension):
rank-based AUC + precision/recall, calibration (reliability) bins,
group-aware k-fold assignment, and add-1-smoothed bigram LM scoring.

These are the eval-side counterparts of the training-data ops in
training.py / corpus_ops.py: a 100 TB pipeline that filters and samples
also has to SCORE its filters (AUC of a cheap quality signal against a
trusted label), CALIBRATE them (reliability bins), and SPLIT leakage-free
(group k-fold: all docs of a source stay in one fold — the document-level
twin of q_split_leakage's n-gram audit).

Exactness: every ratio leaves the engine as floor(x*1e6) computed in a
pure-double pipeline whose inputs are exact integers (IEEE-deterministic
on both engines), or as plain integer sums; the only float transcendental
(ln in the bigram LM) is quantized per bigram TYPE before any summation,
so document scores are integer arithmetic — the same determinism recipe
as q_text_unigram_logprob's pinned fold, but stronger (order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


# ---------------------------------------------------------------------------
# Rank-based AUC + PR at the median threshold
# ---------------------------------------------------------------------------

# AUC is the Mann-Whitney U statistic: P(score_pos > score_neg) + 0.5 *
# P(tie). On the per-score aggregated series (np_s positives, nn_s
# negatives at score s): 2U = sum_s np_s * (2*cum_nn_below + nn_s) —
# integer-exact, no per-row ranks needed.
_AUC_ORACLE = """
    WITH d AS (
      SELECT CAST(n_chars AS BIGINT) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    per AS (
      SELECT s, SUM(label) AS np, COUNT(*) - SUM(label) AS nn
      FROM d GROUP BY s
    ),
    ser AS (
      SELECT s, np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_nn_below,
             SUM(np + nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(np + nn) OVER () AS n_total
      FROM per
    ),
    tot AS (
      SELECT SUM(np * (2 * cum_nn_below + nn)) AS two_u,
             SUM(np) AS n_pos, SUM(nn) AS n_neg,
             MIN(CASE WHEN 2 * cum_n >= n_total THEN s END) AS thr
      FROM ser
    ),
    pr AS (
      SELECT SUM(CASE WHEN ser.s >= tot.thr THEN ser.np ELSE 0 END) AS tp,
             SUM(CASE WHEN ser.s >= tot.thr THEN ser.nn ELSE 0 END) AS fp
      FROM ser, tot
    )
    SELECT CAST(tot.n_pos AS BIGINT) AS n_pos,
           CAST(tot.n_neg AS BIGINT) AS n_neg,
           CAST(FLOOR(CAST(tot.two_u AS DOUBLE) * 1000000
                      / (2.0 * tot.n_pos * tot.n_neg)) AS BIGINT) AS auc_ppm,
           CAST(tot.thr AS BIGINT) AS thr,
           CAST(pr.tp AS BIGINT) AS tp,
           CAST(pr.fp AS BIGINT) AS fp,
           CAST(tot.n_pos - pr.tp AS BIGINT) AS fn,
           CAST(FLOOR(CAST(pr.tp AS DOUBLE) * 1000000 / (pr.tp + pr.fp))
                AS BIGINT) AS precision_ppm,
           CAST(FLOOR(CAST(pr.tp AS DOUBLE) * 1000000 / tot.n_pos)
                AS BIGINT) AS recall_ppm
    FROM tot, pr
"""


@query(
    "q_eval_auc_pr",
    oracle=_AUC_ORACLE,
    tags=("mlops", "eval", "llm-data"),
)
def q_eval_auc_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classifier evaluation of a cheap quality signal: AUC
    (tie-aware Mann-Whitney) of document length predicting lang='en',
    plus precision/recall at the median-score threshold. The shape every
    filter-development loop needs: does my heuristic score actually
    separate the trusted label?

    Integer-exact: AUC runs on the per-score aggregated series
    (2U = sum np*(2*cum_nn_below + nn)), the threshold is the series-
    derived discrete median, and each ratio leaves as floor(x*1e6) on a
    pure-double pipeline over exact integers.

    Scale shape: the base table collapses to |distinct scores| rows in
    one map-side-combinable aggregation; all windows run on that series
    (bounded by score cardinality, not corpus size); the 1-row totals
    frame re-joins by broadcast. No per-row global rank is ever
    materialized — that is the point vs the textbook rank formulation.
    """
    d = tables(spark, sf_dir)["documents"].select(
        F.col("n_chars").cast("bigint").alias("s"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("label"),
    )
    per = d.groupBy("s").agg(
        F.sum("label").alias("np"),
        (F.count(F.lit(1)) - F.sum("label")).alias("nn"),
    )
    w_prev = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ser = per.select(
        "s",
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w_prev), F.lit(0)).alias("cum_nn_below"),
        F.sum(F.col("np") + F.col("nn")).over(w_incl).alias("cum_n"),
        F.sum(F.col("np") + F.col("nn")).over(w_all).alias("n_total"),
    )
    tot = ser.agg(
        F.sum(F.col("np") * (2 * F.col("cum_nn_below") + F.col("nn"))).alias("two_u"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.min(F.when(2 * F.col("cum_n") >= F.col("n_total"), F.col("s"))).alias(
            "thr"
        ),
    )
    pr = (
        ser.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.when(F.col("s") >= F.col("thr"), F.col("np")).otherwise(0)).alias(
                "tp"
            ),
            F.sum(F.when(F.col("s") >= F.col("thr"), F.col("nn")).otherwise(0)).alias(
                "fp"
            ),
        )
    )
    return (
        tot.crossJoin(F.broadcast(pr))
        .select(
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.floor(
                F.col("two_u").cast("double")
                * 1000000
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
            )
            .cast("bigint")
            .alias("auc_ppm"),
            F.col("thr").cast("bigint").alias("thr"),
            F.col("tp").cast("bigint").alias("tp"),
            F.col("fp").cast("bigint").alias("fp"),
            (F.col("n_pos") - F.col("tp")).cast("bigint").alias("fn"),
            F.floor(
                F.col("tp").cast("double") * 1000000 / (F.col("tp") + F.col("fp"))
            )
            .cast("bigint")
            .alias("precision_ppm"),
            F.floor(F.col("tp").cast("double") * 1000000 / F.col("n_pos"))
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Calibration / reliability bins
# ---------------------------------------------------------------------------

_CALIB_ORACLE = """
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    binned AS (
      SELECT s, label, ntile(10) OVER (ORDER BY s, doc_id) AS bin
      FROM d
    )
    SELECT bin, COUNT(*) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(FLOOR(CAST(SUM(s) AS DOUBLE) * 1000000 / COUNT(*)) AS BIGINT)
             AS mean_score_micro,
           CAST(FLOOR(CAST(SUM(label) AS DOUBLE) * 1000000 / COUNT(*)) AS BIGINT)
             AS frac_pos_ppm
    FROM binned GROUP BY bin
"""


@query(
    "q_calibration_bins",
    oracle=_CALIB_ORACLE,
    tags=("mlops", "eval"),
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data: decile bins of the score (ntile over the
    total order (score, doc_id) — deterministic under ties), per-bin
    count, positive count, mean score and positive fraction in exact
    floor-scaled micro units. A calibrated score has frac_pos rising
    monotonically with the bin.

    Scale note (round 12): the bins come from the two-phase distributed
    ntile for real now — operators/ranks.py range-partitions on the
    score, windows per partition, folds per-partition counts into
    driver-side offsets (bounded by the partition count), and derives
    the exact SQL-standard tile split arithmetically from (rank, N).
    No single-partition window remains; the output contract (10 rows)
    is unchanged and hash-identical to the ntile oracle.
    """
    from ..operators.ranks import NTILE_COL, with_global_ntile

    d = tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("s"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("label"),
    )
    binned = with_global_ntile(d, 10, "s", "doc_id").select(
        "s", "label", F.col(NTILE_COL).alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.floor(F.sum("s").cast("double") * 1000000 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_score_micro"),
        F.floor(F.sum("label").cast("double") * 1000000 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("frac_pos_ppm"),
    )


# ---------------------------------------------------------------------------
# Group-aware k-fold assignment
# ---------------------------------------------------------------------------


def _kfold_oracle() -> str:
    from .dedup2 import _h_sql

    return f"""
    WITH folds AS (
      SELECT doc_id, source, n_chars,
             {_h_sql("source", "41")} % 5 AS fold
      FROM documents
    )
    SELECT fold, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM folds GROUP BY fold
    """


@query(
    "q_group_kfold",
    oracle=_kfold_oracle(),
    tags=("mlops", "training", "llm-data", "portable"),
)
def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold split: the fold is a deterministic portable
    hash of the GROUP key (source), so every document of a source lands
    in the same fold by construction — the split that prevents
    train/eval leakage through near-duplicate documents of one crawl
    domain (q_split_leakage audits the n-gram side of the same risk).
    Reports per-fold document, source, and character balance.

    Scale shape: pure map-side hash + one aggregation; the hash is the
    md5 portable construction shared with the MinHash/sketch family
    (dedup2.portable_hash64) so the driver hash-verifies fold
    assignment cross-engine. Swap xxhash64 for JVM-side throughput in
    production, per the documented pairing.
    """
    from .dedup2 import portable_hash64

    d = tables(spark, sf_dir)["documents"]
    folds = d.select(
        (portable_hash64(F.col("source"), 41) % 5).alias("fold"),
        "source",
        "n_chars",
    )
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Add-1-smoothed bigram LM scoring
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = """
    WITH tok AS (
      SELECT doc_id, pos, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ),
    big AS (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    bf AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bf GROUP BY w1, w2),
    c1 AS (SELECT w AS w1, COUNT(*) AS c1 FROM tok GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM tok),
    scored AS (
      SELECT c12.w1, c12.w2,
             CAST(FLOOR(1000000 * ln(CAST(c12.c12 + 1 AS DOUBLE)
                                     / (c1.c1 + v.vocab))) AS BIGINT) AS micro
      FROM c12 JOIN c1 USING (w1) CROSS JOIN v
    ),
    tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bf GROUP BY 1, 2, 3)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(tf.tf * scored.micro) AS BIGINT) AS ll_micro,
           CAST(FLOOR(CAST(SUM(tf.tf * scored.micro) AS DOUBLE) / SUM(tf.tf))
                AS BIGINT) AS mean_micro
    FROM tf JOIN scored USING (w1, w2)
    GROUP BY tf.doc_id
"""


@query(
    "q_bigram_lm_score",
    oracle=_BIGRAM_LM_ORACLE,
    tags=("mlops", "text", "quality", "llm-data"),
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-1-smoothed bigram language-model log-likelihood per document
    (micro-nats): P(w2|w1) = (c12+1)/(c1+V) over corpus-wide counts —
    one step up the n-gram ladder from q_text_unigram_logprob, and the
    standard cheap perplexity proxy for quality filtering.

    Determinism, stronger than the unigram query's pinned fold: ln runs
    once per bigram TYPE and is floor-quantized to integer micro-nats
    BEFORE any aggregation, so every downstream sum is integer
    arithmetic — order-free on any engine. (The quantization is part of
    the operator contract, documented, worth 1e-6 nats of precision.)

    Scale shape: bigrams form via a per-doc lead window (partitioned by
    doc — horizontal); counts are map-side-combinable; the bigram and
    unigram frequency tables join the per-doc tf frame by broadcast at
    fixture scale (shuffle-join with AQE beyond the broadcast threshold
    — the join keys are the natural shuffle keys either way); V is one
    scalar.
    """
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bf = (
        tok.select("doc_id", F.col("w").alias("w1"), F.lead("w").over(w_doc).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    c12 = bf.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tok.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    vocab = tok.agg(F.count_distinct("w")).collect()[0][0]  # one scalar
    scored = c12.join(F.broadcast(c1), "w1").select(
        "w1",
        "w2",
        F.floor(
            1000000
            * F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.lit(int(vocab))))
        )
        .cast("bigint")
        .alias("micro"),
    )
    tf = bf.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(F.broadcast(scored), ["w1", "w2"]).groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("micro")).cast("bigint").alias("ll_micro"),
        F.floor(
            F.sum(F.col("tf") * F.col("micro")).cast("double") / F.sum("tf")
        )
        .cast("bigint")
        .alias("mean_micro"),
    )

"""Round-9 operator batch 1: corpus-curation filters in the CCNet /
Gopher style — the two canonical pre-training quality gates the catalog
still lacked (VERDICT r8 next-steps #6/#7).

Family placement: q_bigram_lm_score is the raw perplexity proxy
(corpus-wide self-scoring); q_ccnet_perplexity_buckets upgrades it to
the CCNet recipe — the LM trains on a designated CLEAN SLICE only, every
doc is scored length-normalized against that model, and the corpus is
cut into head/middle/tail perplexity buckets (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"). q_gopher_quality_rules is its heuristic companion — the
Gopher/C4 rule census (Rae et al. 2021 §A1.1; Raffel et al. 2020) that
real corpus pipelines run next to dedup: cheap per-doc structural rules
plus a per-source pass-rate rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranks import RANK_COL, with_global_ranks
from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (clean-slice bigram LM + head/middle/tail)
# ---------------------------------------------------------------------------


# CTE prefix shared with the capstone mixture query (q_curation_mixture
# in round9d.py): clean-slice bigram LM -> per-doc scores -> global rank.
_CCNET_CTES = """tok AS (
      SELECT doc_id, source, pos, w FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ),
    big AS (
      SELECT doc_id, source, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    bf AS (SELECT doc_id, source, w1, w2 FROM big WHERE w2 IS NOT NULL),
    -- the LM trains on the CLEAN slice only: sources src0..src9
    train_tok AS (
      SELECT w FROM tok WHERE CAST(SUBSTR(source, 4) AS INT) < 10
    ),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bf WHERE CAST(SUBSTR(source, 4) AS INT) < 10
      GROUP BY w1, w2
    ),
    c1 AS (SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM train_tok GROUP BY w),
    v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab FROM train_tok),
    tf AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf FROM bf GROUP BY 1, 2, 3),
    types AS (SELECT DISTINCT w1, w2 FROM tf),
    scored AS (  -- ln once per bigram TYPE, floor-quantized to micro-nats
      SELECT t.w1, t.w2,
             CAST(FLOOR(1000000 * ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
                                     / (COALESCE(c1.c1, 0) + v.vocab))) AS BIGINT)
               AS micro
      FROM types t
      LEFT JOIN c12 ON c12.w1 = t.w1 AND c12.w2 = t.w2
      LEFT JOIN c1 ON c1.w1 = t.w1
      CROSS JOIN v
    ),
    docs AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
             CAST(SUM(tf.tf * scored.micro) AS BIGINT) AS ll_micro,
             CAST(-FLOOR(CAST(SUM(tf.tf * scored.micro) AS DOUBLE) / SUM(tf.tf))
                  AS BIGINT) AS ppl_proxy_q6
      FROM tf JOIN scored USING (w1, w2)
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT d.*, ROW_NUMBER() OVER (ORDER BY ppl_proxy_q6, doc_id) AS rnk,
             (SELECT COUNT(*) FROM docs) AS n_total
      FROM docs d
    )"""


@query(
    "q_ccnet_perplexity_buckets",
    oracle=f"""
    WITH {_CCNET_CTES}
    SELECT doc_id, n_bigrams, ll_micro, ppl_proxy_q6,
           CASE WHEN rnk * 3 <= n_total THEN 'head'
                WHEN rnk * 3 <= 2 * n_total THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
    tags=("text", "quality", "llm-data", "curation", "round9"),
)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter (Wenzek et al. 2020): an add-1
    bigram LM is trained on the designated CLEAN slice (sources
    src0..src9 — the "Wikipedia" role in CCNet), every document is
    scored by length-normalized log-likelihood under that model, and the
    corpus is split into head/middle/tail perplexity buckets by exact
    global thirds — the standard cut used to keep head+middle and drop
    (or downweight) the tail before pre-training.

    Exactness: ln runs once per bigram TYPE and is floor-quantized to
    integer micro-nats before any aggregation (the q_bigram_lm_score
    recipe), so per-doc sums are order-free integer arithmetic; the
    length normalization is one FLOOR(double/double) with an exact
    integer numerator; bucket boundaries are integer comparisons
    (rnk*3 <= n) over a total (score, doc_id) order — no quantile
    interpolation anywhere. OOV bigrams (absent from the clean slice)
    take the smoothed floor ln(1/(c1+V)) via left joins, so the operator
    is total over any scoring corpus.

    Scale shape: token/bigram counting is map-side-combinable groupBys;
    the model attaches by broadcast at the bigram-TYPE grain (vocab^2
    bound, not corpus rows); ranking uses the distributed two-phase
    range-partition rank (operators/ranks.py), never a single-partition
    window — at 100 TB every stage is either a hash-partitioned
    aggregation or a bounded broadcast.
    """
    return _ccnet_bucketed(spark, sf_dir)


def _ccnet_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet plan body, shared with q_curation_mixture (round9d)."""
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.select(
        "doc_id", "source", F.col("w").alias("w1"), F.lead("w").over(wdoc).alias("w2")
    ).filter(F.col("w2").isNotNull())
    is_clean = F.substring("source", 4, 10).cast("int") < 10
    train_tok = tok.filter(is_clean)
    c12 = (
        big.filter(is_clean)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    c1 = train_tok.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    v = train_tok.agg(F.count_distinct("w").cast("bigint").alias("vocab"))
    tf = big.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    types = tf.select("w1", "w2").distinct()
    scored = (
        types.join(F.broadcast(c12), ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.floor(
                F.lit(1000000)
                * F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vocab"))
                )
            )
            .cast("bigint")
            .alias("micro"),
        )
    )
    docs = (
        tf.join(F.broadcast(scored), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("micro")).cast("bigint").alias("ll_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "ll_micro",
            (
                -F.floor(F.col("ll_micro").cast("double") / F.col("n_bigrams"))
            )
            .cast("bigint")
            .alias("ppl_proxy_q6"),
        )
    )
    ranked = with_global_ranks(docs, "ppl_proxy_q6", "doc_id")
    n_total = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "n_bigrams",
            "ll_micro",
            "ppl_proxy_q6",
            F.when(F.col(RANK_COL) * 3 <= F.col("n_total"), F.lit("head"))
            .when(F.col(RANK_COL) * 3 <= 2 * F.col("n_total"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher/C4-style heuristic quality-rule census
# ---------------------------------------------------------------------------

# Rule thresholds, adapted to the fixture's 10-99-word synthetic docs but
# keeping Gopher's structure (word-count bounds, mean-word-length band,
# stopword presence, lexical diversity, single-token domination). All
# comparisons are integer cross-multiplications — no ratio floats.
_STOPWORDS = ("the", "a", "of", "and", "to")


# CTE text shared with the capstone mixture query (round9d.py).
_GOPHER_CTES = f"""per_doc AS (
      SELECT doc_id, source,
             CAST(len(w) AS BIGINT) AS wc,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
             CAST((SELECT COUNT(DISTINCT s)
                   FROM unnest(w) AS u(s)
                   WHERE s IN {_STOPWORDS!r}) AS BIGINT) AS n_stop,
             CAST((SELECT MAX(c) FROM (
                     SELECT COUNT(*) AS c FROM unnest(w) AS u(s) GROUP BY s
                  )) AS BIGINT) AS max_tok,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_wchars
      FROM (SELECT doc_id, source, text, string_split(text, ' ') AS w
            FROM documents)
    ),
    flags AS (
      SELECT source,
             CASE WHEN wc BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS r_wordcount,
             CASE WHEN n_wchars >= 3 * wc AND n_wchars <= 8 * wc
                  THEN 1 ELSE 0 END AS r_meanwordlen,
             CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stopwords,
             CASE WHEN 2 * n_distinct >= wc THEN 1 ELSE 0 END AS r_diversity,
             CASE WHEN 5 * max_tok <= wc THEN 1 ELSE 0 END AS r_domination
      FROM per_doc
    )"""


@query(
    "q_gopher_quality_rules",
    oracle=f"""
    WITH {_GOPHER_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(1 - r_wordcount) AS BIGINT) AS fail_wordcount,
           CAST(SUM(1 - r_meanwordlen) AS BIGINT) AS fail_meanwordlen,
           CAST(SUM(1 - r_stopwords) AS BIGINT) AS fail_stopwords,
           CAST(SUM(1 - r_diversity) AS BIGINT) AS fail_diversity,
           CAST(SUM(1 - r_domination) AS BIGINT) AS fail_domination,
           CAST(SUM(r_wordcount * r_meanwordlen * r_stopwords
                    * r_diversity * r_domination) AS BIGINT) AS n_pass,
           CAST(FLOOR(1000000.0
                * SUM(r_wordcount * r_meanwordlen * r_stopwords
                      * r_diversity * r_domination)
                / COUNT(*)) AS BIGINT) AS pass_rate_q6
    FROM flags
    GROUP BY source
    """,
    tags=("text", "quality", "llm-data", "curation", "round9"),
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality-rule census (Rae et al. 2021
    §A1.1; Raffel et al. 2020): five per-document structural rules —
    word count in [20, 90], mean word length in [3, 8], >= 2 distinct
    stopwords, lexical diversity (distinct/total >= 1/2), no single
    token covering > 1/5 of the doc — rolled up to per-source failure
    counts and a quantized pass rate. This is the most-used filter class
    in real corpus pipelines next to dedup; per-source pass rates are
    how crawl sources get allow/deny-listed.

    Exactness: every rule is an integer cross-multiplication (e.g. mean
    word length in [3,8] <=> 3*wc <= sum_word_chars <= 8*wc), so no
    ratio is ever materialized as a float; the only double is the final
    quantized pass rate (exact integer numerator < 2^53). Mean word
    length uses length(replace(text,' ','')) — exact for the fixture's
    single-space tokenization, same expression both engines.

    Scale shape: one scan; the per-doc rules are codegen expressions
    over the split array except max-token-count, which is a
    (doc_id, word) groupBy (map-side combinable, doc-grain keys — no
    skew); the rollup is a 20-key aggregation. No joins, no windows.
    """
    flags = _gopher_flags(spark, sf_dir)
    all_pass = (
        F.col("r_wordcount")
        * F.col("r_meanwordlen")
        * F.col("r_stopwords")
        * F.col("r_diversity")
        * F.col("r_domination")
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(1 - F.col("r_wordcount")).cast("bigint").alias("fail_wordcount"),
        F.sum(1 - F.col("r_meanwordlen")).cast("bigint").alias("fail_meanwordlen"),
        F.sum(1 - F.col("r_stopwords")).cast("bigint").alias("fail_stopwords"),
        F.sum(1 - F.col("r_diversity")).cast("bigint").alias("fail_diversity"),
        F.sum(1 - F.col("r_domination")).cast("bigint").alias("fail_domination"),
        F.sum(all_pass).cast("bigint").alias("n_pass"),
        F.floor(F.lit(1000000.0) * F.sum(all_pass) / F.count(F.lit(1)))
        .cast("bigint")
        .alias("pass_rate_q6"),
    )


def _gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rule flags (source + five 0/1 columns), shared with
    q_curation_mixture (round9d)."""
    d = tables(spark, sf_dir)["documents"]
    w = F.split("text", " ")
    base = d.select(
        "doc_id",
        "source",
        F.size(w).cast("bigint").alias("wc"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct"),
        F.size(
            F.array_intersect(
                F.array_distinct(w), F.array(*[F.lit(s) for s in _STOPWORDS])
            )
        )
        .cast("bigint")
        .alias("n_stop"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("bigint")
        .alias("n_wchars"),
    )
    max_tok = (
        d.select("doc_id", F.explode(w).alias("s"))
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("max_tok"))
    )
    flags = base.join(max_tok, "doc_id").select(
        "source",
        F.when(F.col("wc").between(20, 90), 1).otherwise(0).alias("r_wordcount"),
        F.when(
            (F.col("n_wchars") >= 3 * F.col("wc"))
            & (F.col("n_wchars") <= 8 * F.col("wc")),
            1,
        )
        .otherwise(0)
        .alias("r_meanwordlen"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r_stopwords"),
        F.when(2 * F.col("n_distinct") >= F.col("wc"), 1)
        .otherwise(0)
        .alias("r_diversity"),
        F.when(5 * F.col("max_tok") <= F.col("wc"), 1)
        .otherwise(0)
        .alias("r_domination"),
    )
    return flags

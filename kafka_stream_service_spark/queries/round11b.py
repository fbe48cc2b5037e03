"""Round-11 batch 2: language-model smoothing, categorical-association
and distribution-drift statistics — each exact-rational or
floor-quantized-per-term so the driver hash verdict is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM (absolute discount D = 3/4)
# ---------------------------------------------------------------------------

# P_KN(w2|w1) = max(c12 - D, 0)/c1 + (D * N1+(w1,.)/c1) * N1+(.,w2)/N1+(.,.)
# with D = 3/4 everything is the exact rational
#   (max(4*c12 - 3, 0) * Nbb + 3 * N1w1 * N1w2) / (4 * c1 * Nbb)
# and the emitted probability is floor(1e9 * num/den) over exact integers
# < 2^53 (one IEEE-identical double division).


@query(
    "q_kneser_ney_bigram",
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
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  CAST(COUNT(*) AS BIGINT) AS n1_fw FROM c12 GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1_bw FROM c12 GROUP BY 1),
    nbb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM c12)
    SELECT b.w1, b.w2, b.c12, c1.c1, c1.n1_fw, cont.n1_bw, nbb.nbb,
           CAST(FLOOR(1000000000.0
                * (CAST(GREATEST(4 * b.c12 - 3, 0) * nbb.nbb
                        + 3 * c1.n1_fw * cont.n1_bw AS DOUBLE)
                   / CAST(4 * c1.c1 * nbb.nbb AS DOUBLE))) AS BIGINT) AS p_kn_q9
    FROM c12 b
    JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN nbb
    """,
    tags=("text", "language-model", "smoothing", "llm-data", "round11"),
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities with absolute
    discount D = 3/4 (Kneser & Ney 1995; Chen & Goodman's benchmark
    winner) — THE n-gram smoothing a quality-filtering perplexity model
    actually uses, one rung above q_bigram_lm_score's add-1: mass
    removed by discounting c12 is redistributed via the CONTINUATION
    count N1+(.,w2) (how many distinct left contexts a word follows),
    which fixes add-k's overestimate of frequent-but-context-bound
    words. Emits every bigram type with its count, context total,
    fan-out/fan-in continuation counts, and P_KN.

    Exactness: with D = 3/4 the probability is the exact rational
    (max(4*c12-3, 0)*Nbb + 3*N1fw*N1bw) / (4*c1*Nbb); numerator and
    denominator are exact integers < 2^53, so the single quantized
    double division is IEEE-identical across engines.

    Scale shape: one bigram explode feeding map-side-combinable
    groupBys at bigram/unigram/type grain; the probability join fans
    the bigram-type table (vocabulary^2-bounded, tiny vs corpus) out by
    two broadcast-sized dimension joins and one 1-row scalar.
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
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1_fw"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1_bw"))
    nbb = c12.agg(F.count(F.lit(1)).cast("bigint").alias("nbb"))
    return (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(nbb))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1_fw",
            "n1_bw",
            "nbb",
            F.floor(
                F.lit(1000000000.0)
                * (
                    (
                        F.greatest(4 * F.col("c12") - 3, F.lit(0)) * F.col("nbb")
                        + 3 * F.col("n1_fw") * F.col("n1_bw")
                    ).cast("double")
                    / (4 * F.col("c1") * F.col("nbb")).cast("double")
                )
            )
            .cast("bigint")
            .alias("p_kn_q9"),
        )
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence: per-source unigram distribution vs corpus
# ---------------------------------------------------------------------------


@query(
    "q_jensen_shannon_sources",
    oracle="""
    WITH tok AS (
      SELECT source, u.w AS w
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
    ),
    sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw FROM tok GROUP BY 1, 2),
    st AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
    cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
    nt AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM cw),
    grid AS (
      SELECT st.source, cw.w, st.n_s, cw.c_w, nt.n,
             COALESCE(sw.c_sw, 0) AS c_sw
      FROM st CROSS JOIN cw CROSS JOIN nt
      LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w
    ),
    terms AS (
      SELECT source, w,
             CASE WHEN c_sw > 0 THEN
               CAST(FLOOR(1000000000.0 * (CAST(c_sw AS DOUBLE) / n_s)
                    * ln(2.0 * (CAST(c_sw AS DOUBLE) / n_s)
                         / (CAST(c_sw AS DOUBLE) / n_s + CAST(c_w AS DOUBLE) / n)))
                    AS BIGINT)
             ELSE 0 END AS t_p_q9,
             CAST(FLOOR(1000000000.0 * (CAST(c_w AS DOUBLE) / n)
                  * ln(2.0 * (CAST(c_w AS DOUBLE) / n)
                       / (CAST(c_sw AS DOUBLE) / n_s + CAST(c_w AS DOUBLE) / n)))
                  AS BIGINT) AS t_q_q9
      FROM grid
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t_p_q9) AS BIGINT) AS kl_p_m_q9,
           CAST(SUM(t_q_q9) AS BIGINT) AS kl_q_m_q9,
           CAST((SUM(t_p_q9) + SUM(t_q_q9)) // 2 AS BIGINT) AS jsd_q9
    FROM terms
    GROUP BY source
    """,
    tags=("stats", "divergence", "drift", "text", "llm-data", "round11"),
)
def q_jensen_shannon_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the corpus distribution — the SYMMETRIC, bounded
    ([0, ln 2]) drift measure that complements the one-sided KL audit:
    a source whose vocabulary usage diverges from the pool is a mixing
    or contamination flag that survives p=0 cells (where raw KL is
    infinite).

    Exactness: both KL halves (P||M and Q||M, M the even mixture) are
    floor-quantized PER WORD — each term a pure-double expression of
    exact integer counts — so the sums are order-free integer
    additions; the final average is an integer floor division. The
    corpus total (not the word count) is MAX-safe because every grid
    row carries the same n.

    Scale shape: one token explode into a (source, word) rollup; the
    grid is source-count x vocabulary (bounded), margins broadcast.
    """
    d = tables(spark, sf_dir)["documents"]
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c_sw"))
    st = sw.groupBy("source").agg(F.sum("c_sw").cast("bigint").alias("n_s"))
    cw = sw.groupBy("w").agg(F.sum("c_sw").cast("bigint").alias("c_w"))
    nt = cw.agg(F.sum("c_w").cast("bigint").alias("n"))
    grid = (
        st.crossJoin(F.broadcast(cw))
        .crossJoin(F.broadcast(nt))
        .join(sw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            "n_s",
            "c_w",
            "n",
            F.coalesce("c_sw", F.lit(0)).cast("bigint").alias("c_sw"),
        )
    )
    p = F.col("c_sw").cast("double") / F.col("n_s")
    q = F.col("c_w").cast("double") / F.col("n")
    t_p = F.when(
        F.col("c_sw") > 0,
        F.floor(F.lit(1000000000.0) * p * F.log(F.lit(2.0) * p / (p + q))).cast(
            "bigint"
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    t_q = F.floor(F.lit(1000000000.0) * q * F.log(F.lit(2.0) * q / (p + q))).cast(
        "bigint"
    )
    terms = grid.select("source", t_p.alias("t_p_q9"), t_q.alias("t_q_q9"))
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("t_p_q9").cast("bigint").alias("kl_p_m_q9"),
        F.sum("t_q_q9").cast("bigint").alias("kl_q_m_q9"),
        F.expr("CAST((SUM(t_p_q9) + SUM(t_q_q9)) DIV 2 AS BIGINT)").alias("jsd_q9"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank test (l_quantity across l_returnflag groups)
# ---------------------------------------------------------------------------


@query(
    "q_kruskal_wallis",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS val, l_returnflag AS grp
      FROM lineitem
    ),
    tv AS (SELECT val, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY val),
    pv AS (
      SELECT val, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS p
      FROM tv
    ),
    gv AS (SELECT grp, val, CAST(COUNT(*) AS BIGINT) AS n_gv FROM v GROUP BY 1, 2),
    rg AS (
      SELECT grp,
             CAST(SUM(n_gv) AS BIGINT) AS n_g,
             CAST(SUM(n_gv * (2 * p + t + 1)) AS BIGINT) AS r2_g
      FROM gv JOIN pv USING (val) GROUP BY grp
    ),
    terms AS (
      SELECT grp, n_g, r2_g,
             CAST(FLOOR((CAST(r2_g AS DOUBLE) / 2.0) * (CAST(r2_g AS DOUBLE) / 2.0)
                  / n_g) AS BIGINT) AS s_g
      FROM rg
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM terms
    ),
    ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM tv),
    h AS (
      SELECT tot.n, tot.k, ties.tie3,
             12.0 * tot.s / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
               - 3.0 * (tot.n + 1) AS h_raw,
             1.0 - CAST(ties.tie3 AS DOUBLE)
                   / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n) AS c_tie
      FROM tot CROSS JOIN ties
    )
    SELECT t.grp, t.n_g, t.r2_g, h.n, h.k,
           CAST(FLOOR(1000000.0 * h.h_raw) AS BIGINT) AS h_q6,
           CAST(FLOOR(1000000.0 * h.h_raw / NULLIF(h.c_tie, 0.0)) AS BIGINT) AS h_corr_q6
    FROM terms t CROSS JOIN h
    """,
    tags=("stats", "nonparametric", "rank-test", "round11"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test — the k-group rank generalization of
    Mann-Whitney (completes the nonparametric tier next to
    q_anova_oneway's parametric F): do the l_returnflag groups draw
    l_quantity from the same distribution? H = 12/(N(N+1)) * sum
    R_g^2/n_g - 3(N+1) over average ranks, with the standard tie
    correction C = 1 - sum(t^3 - t)/(N^3 - N).

    Exactness: l_quantity has a BOUNDED value grain (1..50), so tied
    average ranks come from the per-value census: 2*avgrank = 2*prefix
    + t + 1 is an exact integer, making each group's doubled rank sum
    R2_g exact. The per-group term (R2_g/2)^2/n_g floor-quantizes at
    unit precision (one deterministic double op of exact ints), so the
    cross-group sum is order-free integer addition; H and H/C are then
    single identical double expressions both engines evaluate
    bit-alike.

    Scale shape: two map-side-combinable rollups (value grain, group x
    value grain); the prefix window runs on the 50-row value census;
    everything after is group grain (k rows) with a 1-row broadcast
    scalar attachment.
    """
    li = tables(spark, sf_dir)["lineitem"]
    v = li.select(
        F.col("l_quantity").cast("bigint").alias("val"),
        F.col("l_returnflag").alias("grp"),
    )
    tv = v.groupBy("val").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    pv = tv.select(
        "val", "t", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint").alias("p")
    )
    gv = v.groupBy("grp", "val").agg(F.count(F.lit(1)).cast("bigint").alias("n_gv"))
    rg = (
        gv.join(F.broadcast(pv), "val")
        .groupBy("grp")
        .agg(
            F.sum("n_gv").cast("bigint").alias("n_g"),
            F.sum(F.col("n_gv") * (2 * F.col("p") + F.col("t") + 1))
            .cast("bigint")
            .alias("r2_g"),
        )
    )
    terms = rg.select(
        "grp",
        "n_g",
        "r2_g",
        F.floor(
            (F.col("r2_g").cast("double") / F.lit(2.0))
            * (F.col("r2_g").cast("double") / F.lit(2.0))
            / F.col("n_g")
        )
        .cast("bigint")
        .alias("s_g"),
    )
    tot = terms.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ties = tv.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3")
    )
    h = (
        tot.crossJoin(F.broadcast(ties))
        .withColumn(
            "h_raw",
            F.lit(12.0) * F.col("s") / (F.col("n").cast("double") * (F.col("n") + 1))
            - F.lit(3.0) * (F.col("n") + 1),
        )
        .withColumn(
            "c_tie",
            F.lit(1.0)
            - F.col("tie3").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
            ),
        )
    )
    return terms.crossJoin(F.broadcast(h)).select(
        "grp",
        "n_g",
        "r2_g",
        "n",
        "k",
        F.floor(F.lit(1000000.0) * F.col("h_raw")).cast("bigint").alias("h_q6"),
        F.floor(F.lit(1000000.0) * F.col("h_raw") / F.nullif(F.col("c_tie"), F.lit(0.0)))
        .cast("bigint")
        .alias("h_corr_q6"),
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank (Carbonell & Goldstein 1998), lambda = 0.7, k = 5
# ---------------------------------------------------------------------------

_MMR_POOL = 20
_MMR_K = 5
# integer-scaled lambda: score10 = 7*rel_q6 - 3*maxsim_q6  (10x the usual
# lambda*rel - (1-lambda)*maxsim), so selection compares exact integers.

_MMR_POOL_CTE = """
    qset AS (
      SELECT vec_id AS query_id, qv,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS qn
      FROM q8
      WHERE vec_id % 10 = 7 AND vec_id < 80
    ),
    scored AS (
      SELECT s.query_id, m.vec_id AS nid, m.qv AS mv,
             CAST(list_dot_product(m.qv, m.qv) AS BIGINT) AS nn,
             CAST(FLOOR(1000000.0 * (CAST(list_dot_product(s.qv, m.qv) AS BIGINT)
                  / sqrt(CAST(s.qn AS DOUBLE)
                         * CAST(list_dot_product(m.qv, m.qv) AS BIGINT))))
                  AS BIGINT) AS rel_q6
      FROM qset s JOIN q8 m ON m.vec_id != s.query_id
    ),
    pool AS (
      SELECT query_id, nid, mv, nn, rel_q6
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rel_q6 DESC, nid) AS rn FROM scored)
      WHERE rn <= 20
    ),
    sims AS (
      SELECT a.query_id, a.nid AS id_i, b.nid AS id_j,
             CAST(FLOOR(1000000.0 * (CAST(list_dot_product(a.mv, b.mv) AS BIGINT)
                  / sqrt(CAST(a.nn AS DOUBLE) * b.nn))) AS BIGINT) AS sim_q6
      FROM pool a JOIN pool b
        ON b.query_id = a.query_id AND b.nid != a.nid
    )"""


def _mmr_step_sql(step: int) -> str:
    """CTE pair (candN, selN) for greedy step N >= 2 against selu{N-1}."""
    return f""",
    cand{step} AS (
      SELECT p.query_id, p.nid, p.rel_q6, MAX(s.sim_q6) AS maxsim_q6
      FROM pool p
      JOIN sims s ON s.query_id = p.query_id AND s.id_i = p.nid
      JOIN selu{step - 1} u ON u.query_id = s.query_id AND u.neighbor_id = s.id_j
      WHERE p.nid NOT IN (SELECT neighbor_id FROM selu{step - 1} x
                          WHERE x.query_id = p.query_id)
      GROUP BY p.query_id, p.nid, p.rel_q6
    ),
    sel{step} AS (
      SELECT query_id, nid AS neighbor_id, rel_q6, maxsim_q6,
             7 * rel_q6 - 3 * maxsim_q6 AS mmr10_q6, {step} AS pick_rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY 7 * rel_q6 - 3 * maxsim_q6 DESC, nid) AS rn
            FROM cand{step})
      WHERE rn = 1
    ),
    selu{step} AS (SELECT * FROM selu{step - 1} UNION ALL SELECT * FROM sel{step})"""


from .corpus_ops import _QUANT_SQL as _QUANT  # noqa: E402

_MMR_ORACLE = (
    "WITH "
    + _QUANT
    + ","
    + _MMR_POOL_CTE
    + """,
    sel1 AS (
      SELECT query_id, nid AS neighbor_id, rel_q6,
             CAST(0 AS BIGINT) AS maxsim_q6,
             7 * rel_q6 AS mmr10_q6, 1 AS pick_rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rel_q6 DESC, nid) AS rn FROM pool)
      WHERE rn = 1
    ),
    selu1 AS (SELECT * FROM sel1)"""
    + "".join(_mmr_step_sql(s) for s in range(2, _MMR_K + 1))
    + f"""
    SELECT query_id, CAST(pick_rank AS INT) AS pick_rank, neighbor_id,
           rel_q6, maxsim_q6, CAST(mmr10_q6 AS BIGINT) AS mmr10_q6
    FROM selu{_MMR_K}
    """
)


@query(
    "q_mmr_rerank",
    oracle=_MMR_ORACLE,
    tags=("similarity", "retrieval", "diversity", "rerank", "llm-data", "round11"),
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    greedy diversified top-{_MMR_K} from each query's top-{_MMR_POOL}
    cosine pool — at each step pick argmax lambda*rel - (1-lambda)*
    max-sim-to-already-selected (lambda = 0.7), the standard redundancy
    killer between retrieval and a context window. The selection
    compares the INTEGER score 7*rel_q6 - 3*maxsim_q6 (10x the usual
    scale), ties broken by neighbor_id, so the greedy trajectory is
    fully deterministic.

    Exactness: rel and pairwise sims are the floor-quantized cosine of
    exact integer dots/norms (numpy evaluates the same IEEE expression
    the engines do); the greedy loop runs on integers only. The oracle
    UNROLLS all {_MMR_K} greedy steps as chained CTEs — step N's
    argmax over candidates joined against the union of picks 1..N-1 —
    so the driver hash certifies the entire trajectory.

    Scale shape: the pool rank is the brute-force eval baseline (one
    corpus scan + per-query window); the greedy stage is one
    applyInPandas over {_MMR_POOL}-row groups — pairwise sims are a
    {_MMR_POOL}x{_MMR_POOL} int64 matmul per query, never corpus-grain.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    from .corpus_ops import _quantized

    e = _quantized(tables(spark, sf_dir)["embeddings"])
    qset = e.filter(
        ((F.col("vec_id") % 10) == 7) & (F.col("vec_id") < 80)
    ).select(F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv"))
    idot = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda a, b: a.cast("bigint") * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        e.select(F.col("vec_id").alias("nid"), F.col("qv").alias("m_qv"))
        .crossJoin(F.broadcast(qset))
        .filter(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            "nid",
            "m_qv",
            F.floor(
                F.lit(1000000.0)
                * (
                    idot(F.col("q_qv"), F.col("m_qv")).cast("double")
                    / F.sqrt(
                        idot(F.col("q_qv"), F.col("q_qv")).cast("double")
                        * idot(F.col("m_qv"), F.col("m_qv")).cast("double")
                    )
                )
            )
            .cast("bigint")
            .alias("rel_q6"),
        )
    )
    wp = W.partitionBy("query_id").orderBy(F.col("rel_q6").desc(), "nid")
    pool = (
        scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _MMR_POOL)
        .select("query_id", "nid", "m_qv", "rel_q6")
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["nid"].to_numpy()
        rel = pdf["rel_q6"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.int64) for v in pdf["m_qv"]])
        dots = mat @ mat.T
        nrm = np.diag(dots).astype(np.float64)
        sim = np.floor(
            1000000.0 * (dots.astype(np.float64) / np.sqrt(np.outer(nrm, nrm)))
        ).astype(np.int64)
        order = np.argsort(ids)  # deterministic candidate iteration
        selected: list[int] = []
        out = []
        for step in range(1, min(_MMR_K, len(ids)) + 1):
            best = None
            for i in order:
                if i in selected:
                    continue
                ms = int(max(sim[i, s] for s in selected)) if selected else 0
                score = 7 * int(rel[i]) - 3 * ms
                key = (-score, int(ids[i]))
                if best is None or key < best[0]:
                    best = (key, i, ms, score)
            _, i, ms, score = best
            selected.append(i)
            out.append(
                {
                    "query_id": int(pdf["query_id"].iloc[0]),
                    "pick_rank": step,
                    "neighbor_id": int(ids[i]),
                    "rel_q6": int(rel[i]),
                    "maxsim_q6": ms,
                    "mmr10_q6": score,
                }
            )
        return pd.DataFrame(out)

    return pool.groupBy("query_id").applyInPandas(
        greedy,
        schema=(
            "query_id long, pick_rank int, neighbor_id long,"
            " rel_q6 long, maxsim_q6 long, mmr10_q6 long"
        ),
    )


"""Round-11 batch 9: coreset SELECTION over the embedding corpus
(greedy k-center / farthest-point sampling, the classical 2-approx
cover used to pick maximally-diverse training subsets) and the
Benjamini-Hochberg FDR step-up over a FAMILY of per-source hashed
permutation tests — multiple-testing control, the missing capstone of
the hypothesis-testing tier.

Reference parity note: the reference (StreamsApplication.java) has no
analytics surface; both rows extend the mandated LLM-data tier
(diversity-aware subset selection, statistically-sound source audits)
with exact-arithmetic driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .corpus_ops import _QUANT_SQL, _quantized
from .dedup2 import _h_sql, portable_hash64
from .registry import query

# ---------------------------------------------------------------------------
# Greedy k-center (farthest-point) coreset over int8-quantized embeddings
# ---------------------------------------------------------------------------

_K_SEL = 8  # coreset size; Gonzalez (1985) greedy = 2-approx to k-center


def _d2_sql(a: str, b: str) -> str:
    """Exact integer squared L2 between two int8-range list columns."""
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] - {b}[i] AS BIGINT) * CAST({a}[i] - {b}[i] AS BIGINT)"
        f")) AS BIGINT)"
    )


def _kcenter_oracle() -> str:
    parts = [
        "pts AS (SELECT vec_id, qv FROM q8)",
        "c0 AS (SELECT vec_id, qv FROM pts ORDER BY vec_id LIMIT 1)",
        f"d0 AS (SELECT p.vec_id, p.qv, {_d2_sql('p.qv', 'c.qv')} AS mind"
        " FROM pts p CROSS JOIN c0 c)",
    ]
    for i in range(1, _K_SEL):
        parts.append(
            f"p{i} AS (SELECT vec_id, qv, mind FROM d{i - 1}"
            " ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"d{i} AS (SELECT d.vec_id, d.qv,"
            f" LEAST(d.mind, {_d2_sql('d.qv', 'p.qv')}) AS mind"
            f" FROM d{i - 1} d CROSS JOIN p{i} p)"
        )
    sel = " UNION ALL ".join(
        [
            "SELECT CAST(0 AS BIGINT) AS sel_ix,"
            " (SELECT vec_id FROM c0) AS vec_id,"
            " CAST(0 AS BIGINT) AS d2_at_pick"
        ]
        + [
            f"SELECT CAST({i} AS BIGINT), vec_id, mind FROM p{i}"
            for i in range(1, _K_SEL)
        ]
    )
    return (
        f"WITH {_QUANT_SQL}, "
        + ", ".join(parts)
        + f", rad AS (SELECT CAST(MAX(mind) AS BIGINT) AS radius_final"
        f" FROM d{_K_SEL - 1}), sel AS ({sel})"
        " SELECT sel_ix, vec_id, d2_at_pick, radius_final"
        " FROM sel CROSS JOIN rad"
    )


@query(
    "q_kcenter_coreset",
    oracle=_kcenter_oracle(),
    tags=("similarity", "sampling", "coreset", "llm-data", "round11"),
)
def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal)
    over the int8-quantized embeddings: seed with the lowest vec_id,
    then 7x pick the point FARTHEST from the chosen set (exact integer
    squared L2, ties to the smaller vec_id) — the classical
    2-approximation to the k-center cover, used to select
    maximally-diverse training subsets. Emits each pick with its
    distance-to-set at selection time (a non-increasing sequence) plus
    the final coverage radius max_p min_c d2(p, c) — the quantity the
    approximation guarantee bounds.

    Exactness: quantization is the shared _QUANT_SQL contract; every
    distance, LEAST-update, argmax tie-break, and the radius are exact
    BIGINT ops — no floats after the quantizer.

    Scale shape (100 TB): k iterations, each ONE map-side pass
    computing distance to the single newest center (broadcast literal)
    + a TakeOrdered(1) — the corpus never shuffles and never pairs with
    itself; driver state is k rows (bounded pull, same contract as
    power iteration / Lloyd). The k small jobs are the textbook
    distributed farthest-point schedule.
    """
    pts = _quantized(tables(spark, sf_dir)["embeddings"]).select("vec_id", "qv")
    pts = pts.cache()

    def d2_to(vec: list) -> F.Column:
        arr = F.array(*[F.lit(int(v)) for v in vec])
        return F.aggregate(
            F.zip_with(
                F.col("qv"),
                arr,
                lambda a, b: (a - b).cast("bigint") * (a - b).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    c0 = pts.orderBy("vec_id").limit(1).collect()[0]
    picks = [(0, int(c0.vec_id), 0)]
    cur = pts.withColumn("mind", d2_to(c0.qv))
    for i in range(1, _K_SEL):
        p = cur.orderBy(F.desc("mind"), "vec_id").limit(1).collect()[0]
        picks.append((i, int(p.vec_id), int(p.mind)))
        cur = cur.withColumn("mind", F.least(F.col("mind"), d2_to(p.qv)))
    radius = int(cur.agg(F.max("mind")).collect()[0][0])
    pts.unpersist()
    return spark.createDataFrame(
        [(i, vid, d2, radius) for (i, vid, d2) in picks],
        schema="sel_ix bigint, vec_id bigint, d2_at_pick bigint, radius_final bigint",
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over a family of per-source permutation tests
# ---------------------------------------------------------------------------

_BH_K = 32  # relabelings per test; p-value resolution 1/(K+1)
_BH_SEED = "911"
# alpha = 0.10: the step-up criterion p_(i) <= (i/m) * alpha becomes the
# exact integer comparison 10 * m * p_num <= i * (K + 1), with
# p_num = 1 + #exceedances (so p = p_num / (K + 1), Dwass-style).


# The permutation-family p-value derivation (WITH-body through the pv
# CTE), mirroring q_benjamini_hochberg's inline oracle text verbatim —
# exported for the Holm-Bonferroni step-down in round11v so both
# multiple-testing rows provably rank the SAME p-values (FDR vs FWER
# control over one family).
_PV_CTE = f"""
    x AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv FROM x),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
                 CAST(SUM(v) AS BIGINT) AS sv_s FROM x GROUP BY 1),
    obs AS (
      SELECT s.source, s.n_s,
             CAST(s.sv_s AS DOUBLE) / s.n_s
           - CAST(g.sv - s.sv_s AS DOUBLE) / (g.n - s.n_s) AS d_obs
      FROM s CROSS JOIN g
    ),
    rel AS (
      SELECT s.source, p.i AS perm, x.v,
             CASE WHEN {{h}}
                       % g.n < s.n_s THEN 1 ELSE 0 END AS ing
      FROM x CROSS JOIN s CROSS JOIN g,
           (SELECT unnest(range(0, {_BH_K})) AS i) p
    ),
    perms AS (
      SELECT source, perm,
             CASE WHEN SUM(ing) > 0 AND SUM(1 - ing) > 0 THEN
               CAST(SUM(CASE WHEN ing = 1 THEN v END) AS DOUBLE) / SUM(ing)
             - CAST(SUM(CASE WHEN ing = 0 THEN v END) AS DOUBLE) / SUM(1 - ing)
             END AS d_perm
      FROM rel GROUP BY 1, 2
    ),
    pv AS (
      SELECT o.source, o.n_s,
             CAST(1 + SUM(CASE WHEN ABS(p.d_perm) >= ABS(o.d_obs)
                          THEN 1 ELSE 0 END) AS BIGINT) AS p_num
      FROM perms p JOIN obs o USING (source)
      GROUP BY o.source, o.n_s, o.d_obs
    )
"""


def pv_cte_sql() -> str:
    """The shared p-value CTE body with the hash expression bound."""
    return _PV_CTE.format(
        h=_h_sql(
            "CAST(x.doc_id AS VARCHAR) || ':' || s.source || ':' ||"
            " CAST(p.i AS VARCHAR)",
            _BH_SEED,
        )
    )


@query(
    "q_benjamini_hochberg",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv FROM x),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
                 CAST(SUM(v) AS BIGINT) AS sv_s FROM x GROUP BY 1),
    obs AS (
      SELECT s.source, s.n_s,
             CAST(s.sv_s AS DOUBLE) / s.n_s
           - CAST(g.sv - s.sv_s AS DOUBLE) / (g.n - s.n_s) AS d_obs
      FROM s CROSS JOIN g
    ),
    rel AS (
      SELECT s.source, p.i AS perm, x.v,
             CASE WHEN {_h_sql("CAST(x.doc_id AS VARCHAR) || ':' || s.source || ':' || CAST(p.i AS VARCHAR)", _BH_SEED)}
                       % g.n < s.n_s THEN 1 ELSE 0 END AS ing
      FROM x CROSS JOIN s CROSS JOIN g,
           (SELECT unnest(range(0, {_BH_K})) AS i) p
    ),
    perms AS (
      SELECT source, perm,
             CASE WHEN SUM(ing) > 0 AND SUM(1 - ing) > 0 THEN
               CAST(SUM(CASE WHEN ing = 1 THEN v END) AS DOUBLE) / SUM(ing)
             - CAST(SUM(CASE WHEN ing = 0 THEN v END) AS DOUBLE) / SUM(1 - ing)
             END AS d_perm
      FROM rel GROUP BY 1, 2
    ),
    pv AS (
      SELECT o.source, o.n_s,
             CAST(1 + SUM(CASE WHEN ABS(p.d_perm) >= ABS(o.d_obs)
                          THEN 1 ELSE 0 END) AS BIGINT) AS p_num
      FROM perms p JOIN obs o USING (source)
      GROUP BY o.source, o.n_s, o.d_obs
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pv),
    ranked AS (
      SELECT pv.source, pv.n_s, pv.p_num, m.m,
             CAST(ROW_NUMBER() OVER (ORDER BY pv.p_num, pv.source) AS BIGINT) AS rnk
      FROM pv CROSS JOIN m
    ),
    crit AS (
      SELECT *, CASE WHEN 10 * m * p_num <= rnk * ({_BH_K} + 1)
                     THEN 1 ELSE 0 END AS ok
      FROM ranked
    ),
    imax AS (
      SELECT COALESCE(MAX(CASE WHEN ok = 1 THEN rnk END), 0) AS i_max FROM crit
    )
    SELECT c.source, c.n_s, c.p_num,
           CAST({_BH_K} AS BIGINT) AS n_perms, c.rnk, c.m,
           CAST(c.ok AS BIGINT) AS bh_ok,
           CAST(CASE WHEN c.rnk <= i.i_max THEN 1 ELSE 0 END AS BIGINT) AS rejected
    FROM crit c CROSS JOIN imax i
    """,
    tags=("stats", "hypothesis-test", "multiple-testing", "fdr", "round11"),
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg (1995) FDR step-up over the FAMILY of 20
    per-source tests "does source s's mean document length differ from
    the rest of the corpus?" — each tested with the deterministic
    hashed permutation machinery of q_permutation_test_hashed
    (rate-preserving relabeling: doc d joins the pseudo-source when
    H(d:s:r) % n < n_s, so each draw matches the observed group size in
    expectation). The step-up: rank the m p-values ascending
    (deterministic tie-break by source), find the largest rank i with
    p_(i) <= (i/m) * 0.10, reject ranks 1..i — the multiple-testing
    control a 20-source curation audit actually needs (per-test alpha
    would fire ~2 false alarms per sweep at alpha = 0.1).

    Exactness: p-values are the exact rationals (1 + exceed)/(K + 1)
    carried as integer numerators; the BH criterion is the integer
    comparison 10*m*p_num <= rank*(K+1); mean differences are single
    IEEE divisions of exact integer sums, compared identically in both
    engines (a relabeling that empties either side yields NULL and
    counts as no exceedance in both).

    Scale shape (100 TB): the relabeling grid is corpus x m x K rows
    of ONE md5 + map-side-combinable partial sums — shuffle carries
    only (source, perm) partials; the BH window runs on the m-row
    family (SF-invariant). m and K are constant multipliers, the same
    degradation contract as the single permutation test.
    """
    d = tables(spark, sf_dir)["documents"]
    x = d.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("v")
    )
    g = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
    )
    s = x.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("v").cast("bigint").alias("sv_s"),
    )
    obs = s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_s",
        (
            F.col("sv_s").cast("double") / F.col("n_s")
            - (F.col("sv") - F.col("sv_s")).cast("double")
            / (F.col("n") - F.col("n_s"))
        ).alias("d_obs"),
    )
    fam = s.select(F.col("source").alias("fam_source"), "n_s")
    # Fan the relabeling grid's corpus side to cluster width
    # (optimization r15, guide §2.5): the md5-per-grid-row work below
    # multiplies a SMALL-BYTES scan (one fixture file = one task) by
    # m x K, and the bytes-based split left all of it on one core —
    # stage profile showed 3.8 of this row's 4.3 s in that single task.
    # cpu_fanout is a no-op at production scan widths.
    from ..operators.ranks import cpu_fanout

    rel = (
        cpu_fanout(x.drop("source"))
        .crossJoin(F.broadcast(fam))
        .crossJoin(F.broadcast(g.select("n")))
        .select(
            F.col("fam_source").alias("source"),
            F.explode(F.sequence(F.lit(0), F.lit(_BH_K - 1))).alias("perm"),
            "v",
            "doc_id",
            "n_s",
            "n",
        )
        .select(
            "source",
            "perm",
            "v",
            F.when(
                portable_hash64(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("source"),
                        F.lit(":"),
                        F.col("perm").cast("string"),
                    ),
                    int(_BH_SEED),
                )
                % F.col("n")
                < F.col("n_s"),
                1,
            )
            .otherwise(0)
            .alias("ing"),
        )
    )
    si = F.sum("ing")
    so = F.sum(1 - F.col("ing"))
    perms = rel.groupBy("source", "perm").agg(
        F.when(
            (si > 0) & (so > 0),
            F.sum(F.when(F.col("ing") == 1, F.col("v"))).cast("double") / si
            - F.sum(F.when(F.col("ing") == 0, F.col("v"))).cast("double") / so,
        ).alias("d_perm")
    )
    pv = (
        perms.join(F.broadcast(obs), "source")
        .groupBy("source", "n_s", "d_obs")
        .agg(
            (
                1
                + F.sum(
                    F.when(F.abs(F.col("d_perm")) >= F.abs(F.col("d_obs")), 1)
                    .otherwise(0)
                )
            )
            .cast("bigint")
            .alias("p_num")
        )
        .drop("d_obs")
    )
    m = pv.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ranked = pv.crossJoin(F.broadcast(m)).withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("p_num", "source")).cast("bigint"),
    )
    crit = ranked.withColumn(
        "ok",
        F.when(10 * F.col("m") * F.col("p_num") <= F.col("rnk") * (_BH_K + 1), 1)
        .otherwise(0),
    )
    imax = crit.agg(
        F.coalesce(
            F.max(F.when(F.col("ok") == 1, F.col("rnk"))), F.lit(0).cast("bigint")
        ).alias("i_max")
    )
    return crit.crossJoin(F.broadcast(imax)).select(
        "source",
        "n_s",
        "p_num",
        F.lit(_BH_K).cast("bigint").alias("n_perms"),
        "rnk",
        "m",
        F.col("ok").cast("bigint").alias("bh_ok"),
        F.when(F.col("rnk") <= F.col("i_max"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )

"""Round-11 batch 10: ordered-alternative rank tests and agreement /
association effect sizes — Jonckheere-Terpstra (the ordered-groups
sibling of q_kruskal_wallis), Page's trend test (the ordered-treatments
sibling of q_friedman_test), Fleiss' kappa (the k-rater generalization
of q_cohens_kappa), and Cramer's V (the effect size q_chi2_independence
reports only as a raw statistic).

Reference parity note: the reference (StreamsApplication.java) is a
Kafka transform pass-through with no statistics surface; these extend
the mandated LLM-data curation-audit tier (ordered quality-tier trend
checks, multi-filter agreement, drift effect sizes) with
exact-arithmetic driver oracles.

Exactness follows the repo's recipes (registry.py docstring): counts
and doubled ranks as exact BIGINTs, per-cell quantization BEFORE any
float summation, and z/kappa/V as ONE fixed double-expression tree over
exact integers (identical IEEE result on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# ---------------------------------------------------------------------------
# Jonckheere-Terpstra: ordered alternative across k ordered groups
# ---------------------------------------------------------------------------

# Groups = order priority 1-URGENT < ... < 5-LOW (an a-priori ordered
# scale), values = l_quantity (bounded integer domain 1..50) — "do less
# urgent orders carry systematically larger quantities?". The bounded
# value domain makes the (value x group) census grid SF-invariant
# (<= 50 x 5 cells), so all pair counting happens on the grid.


@query(
    "q_jonckheere_terpstra",
    oracle="""
    WITH v AS (
      SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS grp,
             CAST(l.l_quantity AS BIGINT) AS val
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    cell AS (
      SELECT grp, val, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY grp, val
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN a.val < b.val THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS less_pairs,
             CAST(SUM(CASE WHEN a.val = b.val THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS tie_pairs
      FROM cell a JOIN cell b ON a.grp < b.grp
    ),
    gi AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS n_i
      FROM cell GROUP BY grp
    ),
    tu AS (
      SELECT val, CAST(SUM(c) AS BIGINT) AS t_u
      FROM cell GROUP BY val
    ),
    gsum AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(n_i * n_i) AS BIGINT) AS sn2,
             CAST(SUM(n_i * (n_i - 1) * (2 * n_i + 5)) AS BIGINT) AS a_g,
             CAST(SUM(n_i * (n_i - 1) * (n_i - 2)) AS BIGINT) AS b_g,
             CAST(SUM(n_i * (n_i - 1)) AS BIGINT) AS d_g
      FROM gi
    ),
    tsum AS (
      SELECT CAST(SUM(t_u * (t_u - 1) * (2 * t_u + 5)) AS BIGINT) AS a_t,
             CAST(SUM(t_u * (t_u - 1) * (t_u - 2)) AS BIGINT) AS c_t,
             CAST(SUM(t_u * (t_u - 1)) AS BIGINT) AS e_t
      FROM tu
    )
    SELECT p.less_pairs, p.tie_pairs,
           CAST(2 * p.less_pairs + p.tie_pairs AS BIGINT) AS j2,
           g.n,
           CAST(g.n * g.n - g.sn2 AS BIGINT) AS e_j4,
           CAST(FLOOR(1000000.0
             * ((2.0 * (2 * p.less_pairs + p.tie_pairs)
                 - CAST(g.n * g.n - g.sn2 AS DOUBLE)) / 4.0)
             / NULLIF(SQRT(
                 CAST(g.n * (g.n - 1) * (2 * g.n + 5) - g.a_g - t.a_t
                      AS DOUBLE) / 72.0
               + CAST(g.b_g AS DOUBLE) * CAST(t.c_t AS DOUBLE)
                 / (36.0 * CAST(g.n AS DOUBLE) * (g.n - 1) * (g.n - 2))
               + CAST(g.d_g AS DOUBLE) * CAST(t.e_t AS DOUBLE)
                 / (8.0 * CAST(g.n AS DOUBLE) * (g.n - 1))), 0.0))
             AS BIGINT) AS z_q6
    FROM pairs p CROSS JOIN gsum g CROSS JOIN tsum t
    """,
    tags=("stats", "nonparametric", "ordered-alternative", "round11"),
)
def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across the
    five order-priority groups (1-URGENT < ... < 5-LOW), values =
    lineitem quantities: J = sum over group pairs i<j of the
    Mann-Whitney count #{x_a < x_b} (+ half the ties), asking whether
    quantities trend monotonically with declining urgency — the
    curation question q_kruskal_wallis (unordered) cannot pose. The
    z-score uses the tie-corrected null variance (Hollander & Wolfe
    eq. 6.19), mandatory here because the value domain (1..50) is all
    ties.

    Exactness: all pair counts come from the exact (value x group)
    census grid (2J = 2*#less + #ties stays integer); E[J] is emitted
    as the exact integer 4E = N^2 - sum n_i^2; the variance's three
    tie-correction terms are exact BIGINT sums combined in ONE fixed
    double tree (B*C crosses 2^63 at scale, so that single product is
    taken in double on both engines), and z is one quantized division.

    Scale shape (100 TB): one orderkey-partitioned join feeds a
    map-side-combinable rollup onto the <=250-cell (value x group)
    grid; pair counting is a broadcast self-join of that SF-invariant
    grid — the corpus itself never pairs, never sorts globally.
    """
    t = tables(spark, sf_dir)
    v = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("grp"),
            F.col("l_quantity").cast("bigint").alias("val"),
        )
    )
    cell = v.groupBy("grp", "val").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cell = cell.cache()
    a = cell.select(
        F.col("grp").alias("ga"), F.col("val").alias("va"), F.col("c").alias("ca")
    )
    b = cell.select(
        F.col("grp").alias("gb"), F.col("val").alias("vb"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
        .agg(
            F.sum(
                F.when(F.col("va") < F.col("vb"), F.col("ca") * F.col("cb"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("less_pairs"),
            F.sum(
                F.when(F.col("va") == F.col("vb"), F.col("ca") * F.col("cb"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tie_pairs"),
        )
    )
    gi = cell.groupBy("grp").agg(F.sum("c").cast("bigint").alias("n_i"))
    ni = F.col("n_i")
    gsum = gi.agg(
        F.sum(ni).cast("bigint").alias("n"),
        F.sum(ni * ni).cast("bigint").alias("sn2"),
        F.sum(ni * (ni - 1) * (2 * ni + 5)).cast("bigint").alias("a_g"),
        F.sum(ni * (ni - 1) * (ni - 2)).cast("bigint").alias("b_g"),
        F.sum(ni * (ni - 1)).cast("bigint").alias("d_g"),
    )
    tu = cell.groupBy("val").agg(F.sum("c").cast("bigint").alias("t_u"))
    tc = F.col("t_u")
    tsum = tu.agg(
        F.sum(tc * (tc - 1) * (2 * tc + 5)).cast("bigint").alias("a_t"),
        F.sum(tc * (tc - 1) * (tc - 2)).cast("bigint").alias("c_t"),
        F.sum(tc * (tc - 1)).cast("bigint").alias("e_t"),
    )
    out = (
        pairs.crossJoin(F.broadcast(gsum))
        .crossJoin(F.broadcast(tsum))
        .select(
            "less_pairs",
            "tie_pairs",
            (2 * F.col("less_pairs") + F.col("tie_pairs"))
            .cast("bigint")
            .alias("j2"),
            "n",
            (F.col("n") * F.col("n") - F.col("sn2")).cast("bigint").alias("e_j4"),
            F.floor(
                F.lit(1000000.0)
                * (
                    (
                        F.lit(2.0) * (2 * F.col("less_pairs") + F.col("tie_pairs"))
                        - (F.col("n") * F.col("n") - F.col("sn2")).cast("double")
                    )
                    / F.lit(4.0)
                )
                / F.nullif(
                    F.sqrt(
                        (
                            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                            - F.col("a_g")
                            - F.col("a_t")
                        ).cast("double")
                        / F.lit(72.0)
                        + F.col("b_g").cast("double")
                        * F.col("c_t").cast("double")
                        / (
                            F.lit(36.0)
                            * F.col("n").cast("double")
                            * (F.col("n") - 1)
                            * (F.col("n") - 2)
                        )
                        + F.col("d_g").cast("double")
                        * F.col("e_t").cast("double")
                        / (
                            F.lit(8.0)
                            * F.col("n").cast("double")
                            * (F.col("n") - 1)
                        )
                    ),
                    F.lit(0.0),
                )
            )
            .cast("bigint")
            .alias("z_q6"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Page's trend test: ordered treatments within blocks
# ---------------------------------------------------------------------------

_PAGE_K = 4  # 6-hour day-part buckets, a-priori ordered 0..3


@query(
    "q_page_trend_test",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS blk,
             CAST(date_part('hour', ts) AS BIGINT) // 6 + 1 AS trt_ix,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    full_blk AS (
      SELECT blk FROM cell GROUP BY blk HAVING COUNT(*) = {_PAGE_K}
    ),
    kept AS (SELECT c.* FROM cell c JOIN full_blk USING (blk)),
    ranked AS (
      SELECT blk, trt_ix,
             CAST(2 * (SELECT COUNT(*) FROM kept o
                       WHERE o.blk = c.blk AND o.cents < c.cents)
                  + (SELECT COUNT(*) FROM kept o
                     WHERE o.blk = c.blk AND o.cents = c.cents) + 1
                  AS BIGINT) AS r2
      FROM kept c
    ),
    rj AS (
      SELECT trt_ix, CAST(SUM(r2) AS BIGINT) AS r2_j,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM ranked GROUP BY trt_ix
    ),
    tot AS (
      SELECT CAST(MAX(n_blocks) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(trt_ix * r2_j) AS BIGINT) AS l2
      FROM rj
    )
    SELECT r.trt_ix, r.r2_j, t.n, t.k, t.l2,
           CAST(FLOOR(1000000.0
             * (CAST(t.l2 AS DOUBLE)
                - CAST(t.n AS DOUBLE) * t.k * (t.k + 1) * (t.k + 1) / 2.0)
             / SQRT(CAST(t.n AS DOUBLE) * t.k * t.k * (t.k + 1) * (t.k + 1)
                    * (t.k - 1) / 36.0)) AS BIGINT) AS z_q6
    FROM rj r CROSS JOIN tot t
    """,
    tags=("stats", "nonparametric", "blocked-test", "ordered-alternative",
          "round11"),
)
def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test — q_friedman_test's ordered-treatments sibling:
    within each complete DAY block, the four 6-hour day-parts (an
    a-priori ordered scale) are ranked by revenue, and L = sum_j j*R_j
    asks whether revenue trends monotonically across the day — the
    directional question Friedman's omnibus chi^2 cannot answer.
    Incomplete blocks (a day missing any day-part cell) are excluded on
    both engines before ranking, the standard complete-block
    requirement.

    Exactness: block cells are exact integer cent sums; within-block
    doubled average ranks 2*(#smaller) + (#equal) + 1 are exact
    integers; L is emitted doubled (l2 = sum j * R2_j, exact BIGINT);
    the z-score uses the classical no-ties null moments
    E[L] = nk(k+1)^2/4, Var[L] = nk^2(k+1)^2(k-1)/144 (doubled-rank
    form inlined) as ONE fixed double expression over exact integers.

    Tie convention (deliberate, ADVICE r11): tied cells take average
    (doubled) ranks, but the null variance stays the CLASSICAL no-ties
    Var[L] — the textbook form of Page's tables. With within-block
    ties present the emitted z is therefore conservative-to-nominal
    mis-scaled relative to a tie-corrected Var[L]; on integer-cent
    revenue cells ties are measure-zero in practice, both engines
    compute the identical convention (the oracle inlines the same
    moments), and consumers needing exactness under heavy ties should
    use q_friedman_test's tie-corrected chi^2 instead.

    Scale shape: one (day x day-part) rollup (bounded grain),
    completeness filter + within-block rank over k-row partitions,
    treatment-grain sums, 1-row scalar attachment — data-scale rows
    never sort.
    """
    ev = tables(spark, sf_dir)["events"]
    cell = ev.groupBy(
        F.dayofmonth("ts").cast("bigint").alias("blk"),
        (F.hour("ts").cast("bigint") / 6).cast("bigint").alias("b6"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).select("blk", (F.col("b6") + 1).alias("trt_ix"), "cents")
    wf = Window.partitionBy("blk")
    kept = cell.withColumn("n_cells", F.count(F.lit(1)).over(wf)).filter(
        F.col("n_cells") == _PAGE_K
    )
    wr = Window.partitionBy("blk").orderBy("cents")
    we = Window.partitionBy("blk", "cents")
    ranked = kept.select(
        "blk",
        "trt_ix",
        (2 * (F.rank().over(wr) - 1) + F.count(F.lit(1)).over(we) + 1)
        .cast("bigint")
        .alias("r2"),
    )
    rj = ranked.groupBy("trt_ix").agg(
        F.sum("r2").cast("bigint").alias("r2_j"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    tot = rj.agg(
        F.max("n_blocks").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("trt_ix") * F.col("r2_j")).cast("bigint").alias("l2"),
    )
    return rj.crossJoin(F.broadcast(tot)).select(
        "trt_ix",
        "r2_j",
        "n",
        "k",
        "l2",
        F.floor(
            F.lit(1000000.0)
            * (
                F.col("l2").cast("double")
                - F.col("n").cast("double")
                * F.col("k")
                * (F.col("k") + 1)
                * (F.col("k") + 1)
                / F.lit(2.0)
            )
            / F.sqrt(
                F.col("n").cast("double")
                * F.col("k")
                * F.col("k")
                * (F.col("k") + 1)
                * (F.col("k") + 1)
                * (F.col("k") - 1)
                / F.lit(36.0)
            )
        )
        .cast("bigint")
        .alias("z_q6"),
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa: k-rater chance-corrected agreement
# ---------------------------------------------------------------------------

from .round11c import _FILTER_A_SQL, _FILTER_B_SQL  # noqa: E402
from .round11e import _FILTER_C_SQL  # noqa: E402


@query(
    "q_fleiss_kappa",
    oracle=f"""
    WITH verdicts AS (
      SELECT doc_id,
             CAST(CASE WHEN {_FILTER_A_SQL} THEN 1 ELSE 0 END
                + CASE WHEN {_FILTER_B_SQL} THEN 1 ELSE 0 END
                + CASE WHEN {_FILTER_C_SQL} THEN 1 ELSE 0 END AS BIGINT) AS np
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(np) AS BIGINT) AS t_pass,
             CAST(SUM(np * (np - 1) + (3 - np) * (2 - np)) AS BIGINT) AS s_pairs
      FROM verdicts
    )
    SELECT n, t_pass, s_pairs,
           CAST(FLOOR(1000000000.0
             * (3.0 * n * s_pairs
                - 2.0 * (CAST(t_pass AS DOUBLE) * t_pass
                         + CAST(3 * n - t_pass AS DOUBLE) * (3 * n - t_pass)))
             / NULLIF(2.0 * (9.0 * CAST(n AS DOUBLE) * n
                       - CAST(t_pass AS DOUBLE) * t_pass
                       - CAST(3 * n - t_pass AS DOUBLE) * (3 * n - t_pass)), 0.0))
             AS BIGINT) AS kappa_q9
    FROM agg
    """,
    tags=("stats", "agreement", "quality", "llm-data", "round11"),
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the THREE document-quality filters treated as
    raters (word-count window, lexical diversity, stopword presence;
    the q_cochran_q_filters panel) with categories pass/fail: the
    k-rater generalization of q_cohens_kappa — how much do the filters
    agree BEYOND the agreement their marginal pass rates already
    guarantee? kappa = (P_bar - P_e)/(1 - P_e) with P_bar the mean
    per-document pair agreement and P_e the chance agreement from the
    pooled category shares.

    Exactness: per-document pair-agreement numerators np(np-1) +
    (3-np)(2-np) accumulate as exact integers in one rollup (np is the
    doc's pass count; 3-np its fail count); kappa reduces to the exact
    rational (3N*S - 2(Tp^2 + Tf^2)) / (2*(9N^2 - Tp^2 - Tf^2)),
    emitted as one quantized double of exact integer products (each
    < 2^53 at every fixture SF; at petabyte N the products move to
    DECIMAL(38,0)/HUGEINT, the q_power_iteration emission pattern).

    Scale shape: ONE corpus scan, one global map-side-combinable
    rollup, a 1-row emission — the minimal possible plan.
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
        F.sum(
            F.col("np") * (F.col("np") - 1)
            + (3 - F.col("np")) * (2 - F.col("np"))
        )
        .cast("bigint")
        .alias("s_pairs"),
    )
    tf = (3 * F.col("n") - F.col("t_pass")).cast("double")
    return agg.select(
        "n",
        "t_pass",
        "s_pairs",
        F.floor(
            F.lit(1000000000.0)
            * (
                F.lit(3.0) * F.col("n") * F.col("s_pairs")
                - F.lit(2.0)
                * (F.col("t_pass").cast("double") * F.col("t_pass") + tf * (3 * F.col("n") - F.col("t_pass")))
            )
            / F.nullif(
                F.lit(2.0)
                * (
                    F.lit(9.0) * F.col("n").cast("double") * F.col("n")
                    - F.col("t_pass").cast("double") * F.col("t_pass")
                    - tf * (3 * F.col("n") - F.col("t_pass"))
                ),
                F.lit(0.0),
            )
        )
        .cast("bigint")
        .alias("kappa_q9"),
    )


# ---------------------------------------------------------------------------
# Cramer's V: association effect size for the lang x source contingency
# ---------------------------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ),
    mx AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    my AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source),
    dims AS (
      SELECT CAST((SELECT COUNT(*) FROM mx) AS BIGINT) AS r_levels,
             CAST((SELECT COUNT(*) FROM my) AS BIGINT) AS c_levels
    ),
    grid AS (
      SELECT mx.lang, my.source, mx.r, my.c,
             COALESCE(cells.o, 0) AS o
      FROM mx CROSS JOIN my
      LEFT JOIN cells ON cells.lang = mx.lang AND cells.source = my.source
    ),
    terms AS (
      SELECT CAST(SUM(CAST(FLOOR(1000000.0
               * CAST((n.n * grid.o - grid.r * grid.c) AS DOUBLE)
               * (n.n * grid.o - grid.r * grid.c)
               / (CAST(n.n AS DOUBLE) * grid.r * grid.c)) AS BIGINT))
             AS BIGINT) AS chi2_q6
      FROM grid CROSS JOIN n
    )
    SELECT t.chi2_q6, n.n, d.r_levels, d.c_levels,
           CAST(FLOOR(1000000.0 * SQRT(
             (CAST(t.chi2_q6 AS DOUBLE) / 1000000.0)
             / NULLIF(CAST(n.n AS DOUBLE)
                * LEAST(d.r_levels - 1, d.c_levels - 1), 0.0))) AS BIGINT) AS v_q6
    FROM terms t CROSS JOIN n CROSS JOIN dims d
    """,
    tags=("stats", "association", "effect-size", "drift", "round11"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V for the language x source contingency of the document
    corpus — the normalized [0,1] effect size that makes chi-square
    comparable across corpus snapshots of different size (the raw
    statistic q_chi2_independence emits grows linearly with N even at
    constant association). V = sqrt(chi2 / (N * (min(r,c) - 1))),
    including the zero-count cells of the full r x c grid (they
    contribute rc/N to chi2).

    Exactness: per-cell contributions (N*o - r*c)^2 / (N*r*c) are
    computed from exact integer marginals and floor-quantized to micro
    units BEFORE the sum (the q_chi2_independence recipe); V is one
    quantized sqrt over that exact integer sum.

    Scale shape: one scan to cell grain, two marginal rollups joined
    back broadcast (lang and source are bounded-cardinality
    dimensions), the full grid is r x c rows — everything after the
    first rollup is SF-invariant.
    """
    d = tables(spark, sf_dir)["documents"]
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    mx = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    my = cells.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    dims = mx.agg(F.count(F.lit(1)).cast("bigint").alias("r_levels")).crossJoin(
        my.agg(F.count(F.lit(1)).cast("bigint").alias("c_levels"))
    )
    grid = (
        mx.crossJoin(F.broadcast(my))
        .join(F.broadcast(cells), ["lang", "source"], "left")
        .select("lang", "source", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
    )
    dev = F.col("n") * F.col("o") - F.col("r") * F.col("c")
    terms = grid.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.floor(
                F.lit(1000000.0)
                * dev.cast("double")
                * dev
                / (F.col("n").cast("double") * F.col("r") * F.col("c"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("chi2_q6")
    )
    return (
        terms.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dims))
        .select(
            "chi2_q6",
            "n",
            "r_levels",
            "c_levels",
            F.floor(
                F.lit(1000000.0)
                * F.sqrt(
                    (F.col("chi2_q6").cast("double") / F.lit(1000000.0))
                    / F.nullif(
                        F.col("n").cast("double")
                        * F.least(F.col("r_levels") - 1, F.col("c_levels") - 1),
                        F.lit(0.0),
                    )
                )
            )
            .cast("bigint")
            .alias("v_q6"),
        )
    )

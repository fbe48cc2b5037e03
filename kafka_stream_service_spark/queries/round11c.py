"""Round-11 batch 3: count-of-count smoothing, collocation mining, and
the paired/blocked nonparametric test tier (McNemar, Wilcoxon
signed-rank, Friedman) — every statistic an exact rational or a single
floor-quantized double of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# Shared DuckDB CTE: bigram-type counts over the documents corpus.
_BIGRAM_CTE = """
    toked AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
      SELECT u.g[1] AS w1, u.g[2] AS w2
      FROM toked, unnest(list_transform(
             range(1, greatest(len(toks) - 1, 0) + 1),
             i -> [toks[i], toks[i + 1]])) AS u(g)
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2)"""


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, c12): bigram-type counts, the Spark side of _BIGRAM_CTE."""
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
    return bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))


# ---------------------------------------------------------------------------
# Good-Turing count-of-counts smoothing (bigram types)
# ---------------------------------------------------------------------------


@query(
    "q_good_turing_smoothing",
    oracle=f"""
    WITH {_BIGRAM_CTE},
    coc AS (
      SELECT c12 AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM c12 GROUP BY c12
    ),
    tot AS (
      SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(n_r) AS BIGINT) AS n_types
      FROM coc
    ),
    led AS (
      SELECT r, n_r,
             LEAD(r) OVER (ORDER BY r) AS r_next,
             LEAD(n_r) OVER (ORDER BY r) AS n_next
      FROM coc
    )
    SELECT l.r, l.n_r, t.n_tokens, t.n_types,
           CAST(CASE WHEN l.r_next = l.r + 1
                THEN (l.r + 1) * l.n_next * 1000000 // l.n_r END AS BIGINT)
             AS r_star_q6,
           CAST((SELECT n_r FROM coc WHERE r = 1) * 1000000 // t.n_tokens
                AS BIGINT) AS p0_q6
    FROM led l CROSS JOIN tot t
    """,
    tags=("text", "language-model", "smoothing", "llm-data", "round11"),
)
def q_good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing count-of-counts smoothing over the bigram types: the
    frequency-of-frequencies table N_r, the adjusted count r* =
    (r+1) * N_{{r+1}} / N_r (NULL where the next count class is empty —
    the point where practical GT switches to the raw count), and the
    unseen-mass estimate P_0 = N_1/N — the number that tells a corpus
    owner how much probability their LM should reserve for n-grams it
    has never seen (the same quantity KN's discount redistributes).

    Exactness: all counts are exact integers; r* and P_0 are integer
    floor divisions — no float anywhere.

    Scale shape: one bigram rollup, then a count-of-counts rollup whose
    grain is the number of DISTINCT frequencies (~sqrt of type count);
    the adjacency lead runs on that bounded table.
    """
    c12 = _bigram_counts(spark, sf_dir)
    coc = c12.groupBy(F.col("c12").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    tot = coc.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"),
        F.sum("n_r").cast("bigint").alias("n_types"),
    )
    # always-one-row aggregate (a filter frame would be EMPTY when no
    # type has count 1 — e.g. the sf0.1 fixture's saturated vocabulary —
    # and the crossJoin would wipe the output; the oracle's scalar
    # subquery yields NULL there, so this side must too)
    n1 = coc.agg(
        F.sum(F.when(F.col("r") == 1, F.col("n_r"))).cast("bigint").alias("n_1")
    )
    w = Window.orderBy("r")
    led = coc.select(
        "r",
        "n_r",
        F.lead("r").over(w).alias("r_next"),
        F.lead("n_r").over(w).alias("n_next"),
    )
    return (
        led.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            "n_tokens",
            "n_types",
            F.when(
                F.col("r_next") == F.col("r") + 1,
                F.expr("(r + 1) * n_next * 1000000 DIV n_r"),
            )
            .cast("bigint")
            .alias("r_star_q6"),
            F.expr("n_1 * 1000000 DIV n_tokens").cast("bigint").alias("p0_q6"),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations (bigram association mining)
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


@query(
    "q_pmi_collocations",
    oracle=f"""
    WITH {_BIGRAM_CTE},
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
    c2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
    nt AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM c12)
    SELECT b.w1, b.w2, b.c12, c1.c1, c2.c2,
           CAST(FLOOR(1000000.0 * ln(CAST(b.c12 AS DOUBLE) * nt.n
                / (CAST(c1.c1 AS DOUBLE) * c2.c2))) AS BIGINT) AS pmi_q6,
           CAST(FLOOR(1000000.0 * ln(CAST(b.c12 AS DOUBLE) * nt.n
                / (CAST(c1.c1 AS DOUBLE) * c2.c2))
                / (-ln(CAST(b.c12 AS DOUBLE) / nt.n))) AS BIGINT) AS npmi_q6
    FROM c12 b JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nt
    WHERE b.c12 >= {_PMI_MIN_COUNT}
    """,
    tags=("text", "collocation", "pmi", "llm-data", "round11"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information collocation mining: for every bigram
    type with count >= {_PMI_MIN_COUNT}, PMI = ln(P(w1,w2)/(P(w1)P(w2)))
    and its normalized form NPMI = PMI / -ln P(w1,w2) (Bouma 2009,
    bounded [-1, 1]) — the standard collocation detector a tokenizer
    team runs to decide which word pairs deserve merged tokens, using
    POSITIONAL marginals (w1 as left element, w2 as right) so the
    marginals sum exactly to the bigram total.

    Exactness: counts are exact integers; PMI and NPMI are single
    floor-quantized double expressions of those integers (ln on exact
    ratios, the established cross-engine recipe).

    Scale shape: bigram rollup + two broadcast marginal joins + one
    1-row scalar; output grain is vocabulary^2-bounded.
    """
    c12 = _bigram_counts(spark, sf_dir)
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("c2"))
    nt = c12.agg(F.sum("c12").cast("bigint").alias("n"))
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("n")
        / (F.col("c1").cast("double") * F.col("c2"))
    )
    return (
        c12.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.floor(F.lit(1000000.0) * pmi).cast("bigint").alias("pmi_q6"),
            F.floor(
                F.lit(1000000.0)
                * pmi
                / (-F.log(F.col("c12").cast("double") / F.col("n")))
            )
            .cast("bigint")
            .alias("npmi_q6"),
        )
    )


# ---------------------------------------------------------------------------
# McNemar paired-filter test (do two quality filters disagree beyond noise?)
# ---------------------------------------------------------------------------

# Filter A: Gopher-style word-count-in-range rule; filter B: lexical
# diversity rule — both deterministic integer predicates per document.
_FILTER_A_SQL = "(len(string_split(text, ' ')) BETWEEN 20 AND 90)"
_FILTER_B_SQL = (
    "(2 * len(list_distinct(string_split(text, ' '))) >= len(string_split(text, ' ')))"
)


@query(
    "q_mcnemar_filters",
    oracle=f"""
    WITH verdicts AS (
      SELECT doc_id,
             CASE WHEN {_FILTER_A_SQL} THEN 1 ELSE 0 END AS a,
             CASE WHEN {_FILTER_B_SQL} THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(a * b) AS BIGINT) AS both_pass,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS a_only,
             CAST(SUM((1 - a) * b) AS BIGINT) AS b_only,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS neither
      FROM verdicts
    )
    SELECT both_pass, a_only, b_only, neither,
           CAST(both_pass + a_only + b_only + neither AS BIGINT) AS n,
           CAST(CASE WHEN a_only + b_only > 0 THEN
                  (ABS(a_only - b_only) - 1) * (ABS(a_only - b_only) - 1)
                  * 1000000 // (a_only + b_only)
                ELSE 0 END AS BIGINT) AS mcnemar_q6
    FROM cells
    """,
    tags=("stats", "paired-test", "quality", "llm-data", "round11"),
)
def q_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on two document-quality filters scored over the
    SAME corpus — the paired-binary significance check a curation team
    runs before swapping filter A (Gopher word-count window) for filter
    B (lexical-diversity rule): only the DISCORDANT cells matter, and
    chi^2 = (|b - c| - 1)^2 / (b + c) (continuity-corrected) says
    whether the filters' disagreement is systematic or coin-flip noise.

    Exactness: the 2x2 cells are exact integer counts from two integer
    predicates; the statistic is one integer floor division (exact
    rational x 1e6).

    Scale shape: one scan computing both predicates per document, one
    4-cell global rollup — map-side combinable end to end.
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    verdicts = d.select(
        ((F.size(toks) >= 20) & (F.size(toks) <= 90)).cast("int").alias("a"),
        (2 * F.size(F.array_distinct(toks)) >= F.size(toks)).cast("int").alias("b"),
    )
    cells = verdicts.agg(
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("both_pass"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("a_only"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("b_only"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("neither"),
    )
    return cells.select(
        "both_pass",
        "a_only",
        "b_only",
        "neither",
        (F.col("both_pass") + F.col("a_only") + F.col("b_only") + F.col("neither"))
        .cast("bigint")
        .alias("n"),
        F.when(
            F.col("a_only") + F.col("b_only") > 0,
            F.expr(
                "(ABS(a_only - b_only) - 1) * (ABS(a_only - b_only) - 1)"
                " * 1000000 DIV (a_only + b_only)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mcnemar_q6"),
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test (week-over-week daily revenue pairs)
# ---------------------------------------------------------------------------


@query(
    "q_wilcoxon_signed_rank",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.d, b.cents - a.cents AS diff
      FROM daily a JOIN daily b ON b.d = a.d + 7
    ),
    nz AS (SELECT d, diff, ABS(diff) AS adiff FROM pairs WHERE diff != 0),
    tv AS (SELECT adiff, CAST(COUNT(*) AS BIGINT) AS t FROM nz GROUP BY 1),
    pv AS (
      SELECT adiff, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY adiff
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS p
      FROM tv
    ),
    ranked AS (
      SELECT nz.d, nz.diff, 2 * pv.p + pv.t + 1 AS r2
      FROM nz JOIN pv ON pv.adiff = nz.adiff
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN diff > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_plus,
             CAST(SUM(CASE WHEN diff < 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_minus
      FROM ranked
    ),
    ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM tv)
    SELECT a.n, a.w2_plus, a.w2_minus, ties.tie3,
           CAST(FLOOR(1000000.0
                * (CAST(a.w2_plus AS DOUBLE) / 2.0
                   - CAST(a.n AS DOUBLE) * (a.n + 1) / 4.0)
                / sqrt(CAST(a.n AS DOUBLE) * (a.n + 1) * (2 * a.n + 1) / 24.0
                       - CAST(ties.tie3 AS DOUBLE) / 48.0)) AS BIGINT) AS z_q6
    FROM agg a CROSS JOIN ties
    """,
    tags=("stats", "nonparametric", "paired-test", "timeseries", "round11"),
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on week-over-week daily revenue pairs
    (day d vs day d+7) — the paired nonparametric complement to the
    independent-sample tier (Mann-Whitney via Cliff's delta, the KW
    k-group test): did the second week shift revenue, without assuming
    normality? Zero diffs drop (the standard treatment); |diff| ties
    get average ranks; z is the normal approximation with the exact
    tie-corrected variance.

    Exactness: daily revenue is an exact integer cent sum, so diffs are
    exact; doubled average ranks come from the |diff| value census
    (2*prefix + t + 1, all integers); z is one floor-quantized double
    expression of the exact integer sums.

    Scale shape: one day-grain rollup (bounded, ~30 rows), a self-join
    on day+7, and windows over the tiny |diff| census.
    """
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    b = daily.select((F.col("d") - 7).alias("d"), F.col("cents").alias("cents_b"))
    pairs = daily.join(b, "d").select(
        "d", (F.col("cents_b") - F.col("cents")).alias("diff")
    )
    nz = pairs.filter(F.col("diff") != 0).withColumn("adiff", F.abs("diff"))
    tv = nz.groupBy("adiff").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    w = Window.orderBy("adiff").rowsBetween(Window.unboundedPreceding, -1)
    pv = tv.select(
        "adiff",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint").alias("p"),
    )
    ranked = nz.join(F.broadcast(pv), "adiff").select(
        "diff", (2 * F.col("p") + F.col("t") + 1).alias("r2")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("r2")).otherwise(0))
        .cast("bigint")
        .alias("w2_plus"),
        F.sum(F.when(F.col("diff") < 0, F.col("r2")).otherwise(0))
        .cast("bigint")
        .alias("w2_minus"),
    )
    ties = tv.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3")
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        "n",
        "w2_plus",
        "w2_minus",
        "tie3",
        F.floor(
            F.lit(1000000.0)
            * (
                F.col("w2_plus").cast("double") / F.lit(2.0)
                - F.col("n").cast("double") * (F.col("n") + 1) / F.lit(4.0)
            )
            / F.sqrt(
                F.col("n").cast("double")
                * (F.col("n") + 1)
                * (2 * F.col("n") + 1)
                / F.lit(24.0)
                - F.col("tie3").cast("double") / F.lit(48.0)
            )
        )
        .cast("bigint")
        .alias("z_q6"),
    )


# ---------------------------------------------------------------------------
# Friedman test (blocks = days, treatments = event types)
# ---------------------------------------------------------------------------


@query(
    "q_friedman_test",
    oracle="""
    WITH cell AS (
      SELECT CAST(date_part('day', ts) AS BIGINT) AS blk, event_type AS trt,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT blk, trt,
             CAST(2 * (SELECT COUNT(*) FROM cell o
                       WHERE o.blk = c.blk AND o.cents < c.cents)
                  + (SELECT COUNT(*) FROM cell o
                     WHERE o.blk = c.blk AND o.cents = c.cents) + 1
                  AS BIGINT) AS r2
      FROM cell c
    ),
    rj AS (
      SELECT trt, CAST(SUM(r2) AS BIGINT) AS r2_j,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM ranked GROUP BY trt
    ),
    tot AS (
      SELECT CAST(MAX(n_blocks) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(r2_j * r2_j) AS BIGINT) AS s4
      FROM rj
    )
    SELECT r.trt, r.r2_j, t.n, t.k,
           CAST(FLOOR(1000000.0
                * (12.0 * (CAST(t.s4 AS DOUBLE) / 4.0)
                   / (CAST(t.n AS DOUBLE) * t.k * (t.k + 1))
                   - 3.0 * t.n * (t.k + 1))) AS BIGINT) AS chi2_q6
    FROM rj r CROSS JOIN tot t
    """,
    tags=("stats", "nonparametric", "blocked-test", "round11"),
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the blocked-design rank test (repeated-measures
    ANOVA's nonparametric twin): within each DAY (block), the five
    event types are ranked by their revenue, and chi^2_F =
    12/(nk(k+1)) * sum R_j^2 - 3n(k+1) asks whether any event type
    systematically out-earns the others once day-to-day level shifts
    are blocked away — the question a/b owners ask of per-day metric
    tables.

    Exactness: block cells are exact integer cent sums; within-block
    doubled average ranks are 2*(#smaller) + (#equal) + 1 — exact
    integers from the k-row block census; sum R_j^2 is exact (doubled
    ranks squared stay < 2^53 at any SF because k is the bounded
    event-type cardinality); the statistic is one quantized double.

    Scale shape: one (day x type) rollup (bounded grain), a
    within-block rank over k-row partitions, then treatment-grain
    sums and a 1-row scalar attachment.
    """
    ev = tables(spark, sf_dir)["events"]
    cell = ev.groupBy(
        F.dayofmonth("ts").cast("bigint").alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # doubled average rank within block: 2*(#smaller) + (#equal) + 1 —
    # #smaller is rank()-1 over the block, #equal a count over the
    # (block, value) frame; both windows run on k-row partitions.
    wr = Window.partitionBy("blk").orderBy("cents")
    we = Window.partitionBy("blk", "cents")
    ranked = cell.select(
        "blk",
        "trt",
        (
            2 * (F.rank().over(wr) - 1) + F.count(F.lit(1)).over(we) + 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    rj = ranked.groupBy("trt").agg(
        F.sum("r2").cast("bigint").alias("r2_j"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    tot = rj.agg(
        F.max("n_blocks").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("r2_j") * F.col("r2_j")).cast("bigint").alias("s4"),
    )
    return rj.crossJoin(F.broadcast(tot)).select(
        "trt",
        "r2_j",
        "n",
        "k",
        F.floor(
            F.lit(1000000.0)
            * (
                F.lit(12.0)
                * (F.col("s4").cast("double") / F.lit(4.0))
                / (F.col("n").cast("double") * F.col("k") * (F.col("k") + 1))
                - F.lit(3.0) * F.col("n") * (F.col("k") + 1)
            )
        )
        .cast("bigint")
        .alias("chi2_q6"),
    )

"""Round-9 operator batch 7: distributed multiple linear regression
(normal equations over sufficient statistics) and a KS uniformity audit
of the portable hash family.

Family placement: q_groupwise_regression fits per-group SIMPLE OLS;
this fits a MULTIPLE regression (two features + intercept) the way
every distributed OLS does — nine map-side-combinable moments, then
closed-form Cramer solve on the driver-free 1-row frame. The hash
audit is the meta-test under the entire portable tier (minhash, LSH,
sampling, permutation test): a Kolmogorov-Smirnov distance between the
empirical hash distribution and uniform, computed exactly with wide
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranks import RANK_COL, with_global_ranks
from ..tables import tables
from .dedup2 import SHINGLE_N, _h_sql, portable_hash64
from .registry import query

# ---------------------------------------------------------------------------
# Multiple OLS via normal equations (two features + intercept, Cramer)
# ---------------------------------------------------------------------------


@query(
    "q_ols_normal_equations",
    oracle="""
    WITH x AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x2,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
             CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
             CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
             CAST(SUM(x1 * y) AS HUGEINT) AS sx1y,
             CAST(SUM(x2 * y) AS HUGEINT) AS sx2y,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM x
    ),
    dd AS (  -- separate CTE: a same-SELECT alias would resolve to the
             -- BIGINT base column in DuckDB and overflow the determinant
      SELECT n, CAST(sy AS DOUBLE) AS sy, CAST(sx1y AS DOUBLE) AS sx1y,
             CAST(sx2y AS DOUBLE) AS sx2y, CAST(syy AS DOUBLE) AS syy,
             CAST(sx1 AS DOUBLE) AS sx1, CAST(sx2 AS DOUBLE) AS sx2,
             CAST(sx11 AS DOUBLE) AS sx11, CAST(sx22 AS DOUBLE) AS sx22,
             CAST(sx12 AS DOUBLE) AS sx12
      FROM m
    ),
    d AS (
      SELECT *,
             (CAST(n AS DOUBLE) * (sx11 * sx22 - sx12 * sx12)
              - sx1 * (sx1 * sx22 - sx12 * sx2)
              + sx2 * (sx1 * sx12 - sx11 * sx2)) AS det
      FROM dd
    )
    SELECT n,
           CAST(FLOOR(1000000.0 * (
             (sy * (sx11 * sx22 - sx12 * sx12)
              - sx1 * (sx1y * sx22 - sx12 * sx2y)
              + sx2 * (sx1y * sx12 - sx11 * sx2y)) / det)) AS BIGINT) AS b0_q6,
           CAST(FLOOR(1000000.0 * (
             (CAST(n AS DOUBLE) * (sx1y * sx22 - sx2y * sx12)
              - sy * (sx1 * sx22 - sx12 * sx2)
              + sx2 * (sx1 * sx2y - sx1y * sx2)) / det)) AS BIGINT) AS b1_q6,
           CAST(FLOOR(1000000.0 * (
             (CAST(n AS DOUBLE) * (sx11 * sx2y - sx12 * sx1y)
              - sx1 * (sx1 * sx2y - sx1y * sx2)
              + sy * (sx1 * sx12 - sx11 * sx2)) / det)) AS BIGINT) AS b2_q6,
           CAST(FLOOR(1000000.0 * (1.0 -
             (syy
              - ((sy * (sx11 * sx22 - sx12 * sx12)
                  - sx1 * (sx1y * sx22 - sx12 * sx2y)
                  + sx2 * (sx1y * sx12 - sx11 * sx2y)) / det) * sy
              - ((CAST(n AS DOUBLE) * (sx1y * sx22 - sx2y * sx12)
                  - sy * (sx1 * sx22 - sx12 * sx2)
                  + sx2 * (sx1 * sx2y - sx1y * sx2)) / det) * sx1y
              - ((CAST(n AS DOUBLE) * (sx11 * sx2y - sx12 * sx1y)
                  - sx1 * (sx1 * sx2y - sx1y * sx2)
                  + sy * (sx1 * sx12 - sx11 * sx2)) / det) * sx2y)
             / (syy - sy * sy / n))) AS BIGINT) AS r2_q6
    FROM d
    """,
    tags=("mlops", "regression", "stats", "round9"),
)
def q_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed MULTIPLE linear regression: extendedprice-cents ~
    quantity + discount-points, fit in closed form from nine sufficient
    statistics (the normal equations solved by Cramer's rule) plus the
    R^2 from the same moments — exactly how distributed OLS works at any
    scale (moments are map-side-combinable; no per-row residual pass,
    no iteration). Extends q_groupwise_regression (per-group simple OLS)
    to the multi-feature case.

    Exactness: all moments are exact integers (BIGINT where bounded,
    HUGEINT/DECIMAL(38,0) for the y moments — the q_welch_ttest wide-
    moment contract); the Cramer determinants, betas, and R^2 are one
    fixed double expression tree over them, quantized at 1e6. The same
    determinant/beta expressions appear verbatim in both engine texts.

    Scale shape: ONE scan, one conditional aggregation (partial
    map-side combine), then scalar algebra on a 1-row frame. k features
    cost O(k^2) moment columns in the same single pass.
    """
    li = tables(spark, sf_dir)["lineitem"]
    x = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        (F.col("l_discount").cast("decimal(4,2)") * 100).cast("bigint").alias("x2"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    yd = F.col("y").cast("decimal(38,0)")
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1"),
        F.sum("x2").cast("bigint").alias("sx2"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).cast("decimal(38,0)").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("decimal(38,0)").alias("sx2y"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    d = m.select(
        "n",
        *[F.col(c).cast("double").alias(c) for c in
          ("sy", "sx1y", "sx2y", "syy", "sx1", "sx2", "sx11", "sx22", "sx12")],
    ).select(
        "*",
        (
            F.col("n").cast("double")
            * (F.col("sx11") * F.col("sx22") - F.col("sx12") * F.col("sx12"))
            - F.col("sx1")
            * (F.col("sx1") * F.col("sx22") - F.col("sx12") * F.col("sx2"))
            + F.col("sx2")
            * (F.col("sx1") * F.col("sx12") - F.col("sx11") * F.col("sx2"))
        ).alias("det"),
    )
    b0 = (
        F.col("sy") * (F.col("sx11") * F.col("sx22") - F.col("sx12") * F.col("sx12"))
        - F.col("sx1") * (F.col("sx1y") * F.col("sx22") - F.col("sx12") * F.col("sx2y"))
        + F.col("sx2") * (F.col("sx1y") * F.col("sx12") - F.col("sx11") * F.col("sx2y"))
    ) / F.col("det")
    b1 = (
        F.col("n").cast("double")
        * (F.col("sx1y") * F.col("sx22") - F.col("sx2y") * F.col("sx12"))
        - F.col("sy") * (F.col("sx1") * F.col("sx22") - F.col("sx12") * F.col("sx2"))
        + F.col("sx2") * (F.col("sx1") * F.col("sx2y") - F.col("sx1y") * F.col("sx2"))
    ) / F.col("det")
    b2 = (
        F.col("n").cast("double")
        * (F.col("sx11") * F.col("sx2y") - F.col("sx12") * F.col("sx1y"))
        - F.col("sx1") * (F.col("sx1") * F.col("sx2y") - F.col("sx1y") * F.col("sx2"))
        + F.col("sy") * (F.col("sx1") * F.col("sx12") - F.col("sx11") * F.col("sx2"))
    ) / F.col("det")
    r2 = F.lit(1.0) - (
        F.col("syy") - b0 * F.col("sy") - b1 * F.col("sx1y") - b2 * F.col("sx2y")
    ) / (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    q6 = lambda c: F.floor(F.lit(1000000.0) * c).cast("bigint")  # noqa: E731
    return d.select(
        "n",
        q6(b0).alias("b0_q6"),
        q6(b1).alias("b1_q6"),
        q6(b2).alias("b2_q6"),
        q6(r2).alias("r2_q6"),
    )


# ---------------------------------------------------------------------------
# KS uniformity audit of the portable 60-bit hash
# ---------------------------------------------------------------------------

_M60 = 1 << 60


@query(
    "q_hash_uniformity_audit",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT array_to_string(list_slice(toks, i + 1, i + {SHINGLE_N}), ' ')
               AS s
      FROM t, unnest(range(0, greatest(len(toks) - {SHINGLE_N}, 0) + 1)) AS u(i)
    ),
    h AS (SELECT DISTINCT {_h_sql('s', '0')} AS hv FROM sh),
    r AS (
      SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS i,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM h) AS n
      FROM h
    ),
    g AS (
      SELECT MAX(CAST(i AS HUGEINT) * {_M60} - CAST(n AS HUGEINT) * hv)
               AS d_plus_num,
             MAX(CAST(n AS HUGEINT) * hv - (CAST(i AS HUGEINT) - 1) * {_M60})
               AS d_minus_num,
             CAST(MAX(n) AS BIGINT) AS n
      FROM r
    )
    SELECT n,
           CAST(FLOOR(1000000000.0 * CAST(d_plus_num AS DOUBLE)
                / (CAST(n AS DOUBLE) * {_M60})) AS BIGINT) AS d_plus_q9,
           CAST(FLOOR(1000000000.0 * CAST(d_minus_num AS DOUBLE)
                / (CAST(n AS DOUBLE) * {_M60})) AS BIGINT) AS d_minus_q9,
           CAST(FLOOR(1000000.0 * (
             GREATEST(CAST(d_plus_num AS DOUBLE), CAST(d_minus_num AS DOUBLE))
             / (CAST(n AS DOUBLE) * {_M60}) * sqrt(CAST(n AS DOUBLE))
           )) AS BIGINT) AS ks_sqrt_n_q6
    FROM g
    """,
    tags=("stats", "hashing", "audit", "portable", "round9"),
)
def q_hash_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov uniformity audit of portable_hash64 — the hash
    family underneath the ENTIRE portable tier (minhash signatures, LSH
    buckets, coordinated samples, fold assignment, the permutation
    test): the one-sample KS distance between the empirical distribution
    of distinct shingle hashes and Uniform[0, 2^60), plus sqrt(n)-scaled
    D (compared against the 1.36 critical value at alpha=0.05 by the
    consumer). A biased hash would silently skew every one of those
    operators; this query makes the assumption they share measurable.

    Exactness: D+ = max_i(i/n - h_i/M) and D- are computed as WIDE
    INTEGER maxima (i*M - n*h_i over HUGEINT/DECIMAL(38,0) — exact, no
    float ECDF), then quantized through one fixed double expression.
    The rank comes from the distributed two-phase range-partition rank,
    not a single-partition window (Spark side).

    Scale shape: distinct-hash dedup + the operators/ranks.py rank (one
    range exchange + per-partition windows) + a max aggregation — every
    stage hash/range-partitioned.
    """
    d = tables(spark, sf_dir)["documents"]
    from ..operators.dedup import word_shingles_from_tokens

    # materialize the token array BEFORE the shingle transform: inlining
    # split() into the per-position slices re-evaluates it O(len) times
    # per doc (the documented decontaminate inlining trap — measured
    # 9.8 s -> 1.3 s for this distinct)
    # Optimization r15, measured and left alone: fanning the scan-rooted
    # shingle pass (cpu_fanout over the text projection) parallelizes
    # its single task but does NOT move the row's wall time (interleaved
    # A/B 5.5-5.9 s both ways) — the wall is the md5 over distinct
    # shingles plus the rank machinery, already at cluster width. The
    # plan is kept unchanged to avoid an idle re-cert seat.
    sh = (
        d.select(F.split("text", " ").alias("toks"))
        .select(word_shingles_from_tokens(F.col("toks"), SHINGLE_N).alias("shingles"))
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    # NOTE (optimization r15, measured): hashing every occurrence and
    # deduping the 8-byte hashes instead (guide §2.3, one exchange of
    # longs instead of a string exchange + a hash exchange) LOSES here —
    # interleaved A/B at sf0.1 measured 5.5-6.2 s -> 5.7-8.7 s — because
    # portable_hash64 is md5 (~16x an xxhash64) and the distinct-first
    # form hashes each distinct shingle once, not once per occurrence.
    h = sh.select(portable_hash64(F.col("s"), 0).alias("hv")).distinct()
    ranked = with_global_ranks(h, "hv", "hv")
    n = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rn = ranked.crossJoin(F.broadcast(n))
    m = F.lit(_M60).cast("decimal(38,0)")
    i_d = F.col(RANK_COL).cast("decimal(38,0)")
    n_d = F.col("n").cast("decimal(38,0)")
    hv_d = F.col("hv").cast("decimal(38,0)")
    g = rn.agg(
        F.max(i_d * m - n_d * hv_d).alias("d_plus_num"),
        F.max(n_d * hv_d - (i_d - 1) * m).alias("d_minus_num"),
        F.max("n").cast("bigint").alias("n"),
    )
    denom = F.col("n").cast("double") * F.lit(float(_M60))
    return g.select(
        "n",
        F.floor(F.lit(1000000000.0) * F.col("d_plus_num").cast("double") / denom)
        .cast("bigint")
        .alias("d_plus_q9"),
        F.floor(F.lit(1000000000.0) * F.col("d_minus_num").cast("double") / denom)
        .cast("bigint")
        .alias("d_minus_q9"),
        F.floor(
            F.lit(1000000.0)
            * (
                F.greatest(
                    F.col("d_plus_num").cast("double"),
                    F.col("d_minus_num").cast("double"),
                )
                / denom
                * F.sqrt(F.col("n").cast("double"))
            )
        )
        .cast("bigint")
        .alias("ks_sqrt_n_q6"),
    )

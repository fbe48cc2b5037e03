"""Round-11 batch 20: split-conformal prediction — the
distribution-free prediction-interval recipe (Vovk et al.; Lei et al.
2018) run end-to-end: deterministic hash splits, a train-split model,
the exact finite-sample calibration quantile, and the guaranteed-
coverage audit on the held-out test split. The eval tier's missing
uncertainty leg: point-metric rows (MCC, AUC, Brier) say how good the
model is; this row says how WIDE an interval must be for 90% coverage
and then proves the guarantee held.

Reference parity note: the reference (StreamsApplication.java) has no
ML surface; this extends the mandated quality/eval tier with an
exact-arithmetic driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .dedup2 import _h_sql, portable_hash64
from .registry import query

_CONF_SEED = "1415"
# alpha = 0.1: q-hat is the ceil(0.9 * (n_calib + 1))-th smallest
# calibration score — the exact finite-sample split-conformal quantile.


@query(
    "q_conformal_coverage",
    oracle=f"""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             {_h_sql("CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)", _CONF_SEED)}
               % 4 AS split
      FROM lineitem
    ),
    pred AS (
      SELECT q, CAST(SUM(y) // COUNT(*) AS BIGINT) AS yhat
      FROM base WHERE split <= 1 GROUP BY q
    ),
    calib AS (
      SELECT ABS(b.y - p.yhat) AS s
      FROM base b JOIN pred p USING (q) WHERE b.split = 2
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_calib FROM calib),
    kq AS (SELECT n_calib, (9 * n_calib + 18) // 10 AS k FROM nc),
    qhat AS (
      SELECT CAST(s AS BIGINT) AS qhat FROM calib CROSS JOIN kq
      ORDER BY s LIMIT 1 OFFSET (SELECT k - 1 FROM kq)
    ),
    test AS (
      SELECT ABS(b.y - p.yhat) AS s
      FROM base b JOIN pred p USING (q) WHERE b.split = 3
    ),
    cov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.s <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT)
               AS covered
      FROM test t CROSS JOIN qhat qh
    )
    SELECT k.n_calib, k.k, qh.qhat, c.n_test, c.covered,
           CAST(c.covered * 1000000 // c.n_test AS BIGINT) AS coverage_q6
    FROM kq k CROSS JOIN qhat qh CROSS JOIN cov c
    """,
    tags=("stats", "eval", "conformal", "ml-prep", "llm-data", "round11"),
)
def q_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for lineitem price, audited:
    rows hash-split 50/25/25 into train/calibration/test (portable md5,
    so both engines draw identical splits); the model is the
    train-split per-quantity mean price (integer floor); q-hat is the
    EXACT ceil(0.9*(n_calib+1))-th smallest calibration residual — the
    finite-sample split-conformal quantile whose guarantee
    P(|y - yhat| <= qhat) >= 0.9 holds for ANY model, distribution-free
    — and the emitted test coverage proves it held (coverage_q6 >=
    ~900000 up to binomial noise).

    Exactness: splits, the per-group integer-mean model, residuals,
    and the rank threshold k = (9*n_calib + 18) // 10 are pure
    integers; q-hat is an order statistic of an integer multiset
    (tie-order free); coverage is one integer floor division.

    Scale shape: one scan + a bounded per-quantity model rollup
    broadcast back; q-hat at scale is the documented two-phase
    distributed order statistic — a residual-bucket census (domain-
    bounded, zone-map friendly) locates the k-th rank's bucket, and
    only that bucket's residuals sort. Coverage is one
    map-side-combinable fold.
    """
    li = tables(spark, sf_dir)["lineitem"]
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        (
            portable_hash64(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string"),
                int(_CONF_SEED),
            )
            % 4
        ).alias("split"),
    )
    base = base.cache()
    pred = (
        base.filter(F.col("split") <= 1)
        .groupBy("q")
        .agg(F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("yhat"))
    )
    calib = (
        base.filter(F.col("split") == 2)
        .join(F.broadcast(pred), "q")
        .select(F.abs(F.col("y") - F.col("yhat")).alias("s"))
    )
    calib = calib.cache()
    kq = calib.agg(F.count(F.lit(1)).cast("bigint").alias("n_calib")).select(
        "n_calib",
        F.expr("(9 * n_calib + 18) DIV 10").cast("bigint").alias("k"),
    )
    # two-phase exact order statistic: coarse residual-bucket census ->
    # the k-th rank's bucket -> sort only that bucket's residuals
    buckets = calib.groupBy(F.expr("s DIV 100").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select("b", "cnt", F.sum("cnt").over(wb).alias("cum"))
    target = (
        cum.crossJoin(F.broadcast(kq))
        .filter(F.col("cum") >= F.col("k"))
        .orderBy("b")
        .limit(1)
        .select(
            "b", (F.col("k") - (F.col("cum") - F.col("cnt"))).alias("offset_in_b")
        )
    )
    in_bucket = calib.join(
        F.broadcast(target), F.expr("s DIV 100") == F.col("b")
    )
    qhat = (
        in_bucket.withColumn("rn", F.row_number().over(Window.orderBy("s")))
        .filter(F.col("rn") == F.col("offset_in_b"))
        .select(F.col("s").cast("bigint").alias("qhat"))
    )
    test = (
        base.filter(F.col("split") == 3)
        .join(F.broadcast(pred), "q")
        .select(F.abs(F.col("y") - F.col("yhat")).alias("s"))
    )
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("s") <= F.col("qhat"), 1).otherwise(0))
        .cast("bigint")
        .alias("covered"),
    )
    return (
        kq.crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(cov))
        .select(
            "n_calib",
            "k",
            "qhat",
            "n_test",
            "covered",
            F.expr("CAST(covered * 1000000 DIV n_test AS BIGINT)").alias(
                "coverage_q6"
            ),
        )
    )

"""Round-7 operator batch 13: Zipf law fit and temporal split with
embargo — two small, high-leverage corpus/ML-prep diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_zipf_law_fit",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    posd AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos FROM t
    ),
    tok AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos, ts[pos] AS w FROM posd
    ),
    bg AS (
      SELECT w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
      FROM tok
    ),
    freq AS (
      SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM bg
      WHERE gram IS NOT NULL GROUP BY gram
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS r FROM freq
    ),
    pts AS (
      SELECT CAST(FLOOR(1000000.0 * LN(CAST(r AS DOUBLE))) AS BIGINT) AS x,
             CAST(FLOOR(1000000.0 * LN(CAST(n AS DOUBLE))) AS BIGINT) AS y
      FROM ranked WHERE r <= 500
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
           CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
    FROM pts
    """,
    tags=("text", "zipf", "corpus-stats", "round7"),
)
def q_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the bigram vocabulary: the least-
    squares slope of ln(freq) vs ln(rank) for the top-500 grams — a
    natural-language corpus sits near slope -1, and drift in the slope
    is a cheap corpus-health signal (template spam flattens it,
    truncation steepens it). Both logs are floor-quantized to integers
    PER POINT, so the regression parts (n*Sxy - SxSy over quantized
    ints) aggregate order-free and hash exactly; the caller divides
    slope_num/slope_den.

    The bigram stream is per-document (LEAD partitioned by doc_id over
    token position) — no bigram crosses a document boundary and no
    global-order window exists anywhere.

    Scale shape: one groupBy for the histogram; ranking the top-500 is
    a TakeOrdered-sized problem (the histogram is vocabulary-sized,
    not corpus-sized); the regression is a bounded aggregate."""
    d = tables(spark, sf_dir)["documents"]
    # deterministic global token sequence: per-doc positions, ordered by
    # (doc_id, pos) — same sequence the oracle's LEAD() walks
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .withColumn(
            "nxt",
            F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos")),
        )
    )
    freq = (
        tok.filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "w", "nxt").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("n").desc(), "gram"))
    ).filter(F.col("r") <= 500)
    pts = ranked.select(
        F.floor(F.lit(1000000.0) * F.log(F.col("r").cast("double"))).cast("bigint").alias("x"),
        F.floor(F.lit(1000000.0) * F.log(F.col("n").cast("double"))).cast("bigint").alias("y"),
    )
    cnt = F.count(F.lit(1))
    return pts.agg(
        cnt.cast("bigint").alias("n_points"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
        .cast("bigint")
        .alias("slope_num"),
        (cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        .cast("bigint")
        .alias("slope_den"),
    )


@query(
    "q_temporal_split_embargo",
    oracle="""
    WITH b AS (
      SELECT (SELECT MIN(ts) FROM events) + INTERVAL 21 DAY AS cut
    )
    SELECT CAST(CASE WHEN ts < b.cut - INTERVAL 24 HOUR THEN 'train'
                     WHEN ts < b.cut THEN 'embargo'
                     ELSE 'test' END AS VARCHAR) AS split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events, b GROUP BY 1
    """,
    tags=("ml-prep", "split", "backtest", "round7"),
)
def q_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an embargo gap — the leakage-safe
    backtesting protocol (de Prado's purged split): train is everything
    more than 24 h before the day-21 cut, test is everything
    after the cut, and the 24 h in between is EMBARGOED (discarded) so
    near-boundary label/feature windows cannot straddle the split.
    Complements q_group_kfold (entity leakage) and q_split_leakage
    (content leakage) with the time axis.

    Scale shape: two scalar aggregates broadcast as the cut, then one
    map-side classification + bounded groupBy; COUNT(DISTINCT) is the
    standard two-phase partial."""
    ev = tables(spark, sf_dir)["events"]
    import datetime

    lo = ev.agg(F.min("ts").alias("lo")).collect()[0]["lo"]
    cut_col = F.lit(lo + datetime.timedelta(days=21)).cast("timestamp_ntz")
    split = (
        F.when(F.col("ts") < cut_col - F.expr("INTERVAL 24 HOURS"), "train")
        .when(F.col("ts") < cut_col, "embargo")
        .otherwise("test")
    )
    return ev.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )

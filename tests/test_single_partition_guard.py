"""SinglePartition-exchange companion guard (ADVICE r11).

``count_shuffle_exchanges`` counts only keyed (hash/range) shuffles, so a
plan that collapses a data-scale subtree onto ONE partition — the classic
un-partitioned ``Window.orderBy`` regression — would score zero against
every shuffle budget while being the worst possible plan at scale. The
``single_partition_offenders`` companion flags exactly that shape; these
tests pin its behavior on both the pathological and the legitimate uses
of SinglePartition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_stream_service_spark.plans import (
    assert_no_data_scale_single_partition,
    physical_plan,
    single_partition_offenders,
)


def _events(spark):
    return spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )


def test_global_window_orderby_is_flagged(spark):
    df = _events(spark).withColumn("rn", F.row_number().over(Window.orderBy("v")))
    offenders = single_partition_offenders(physical_plan(df))
    assert offenders, "un-partitioned Window.orderBy must flag a SinglePartition offender"


def test_global_sort_collapse_not_misattributed(spark):
    # A partitioned window is fine: hashpartitioning exchange, no
    # SinglePartition collapse.
    df = _events(spark).withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("v"))
    )
    assert_no_data_scale_single_partition(df)


def test_post_aggregation_single_partition_is_safe(spark):
    # Global aggregate: rows are reduced to ONE before the SinglePartition
    # exchange — the legitimate scalar-attachment shape the catalog uses.
    df = _events(spark).agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    assert_no_data_scale_single_partition(df)


def test_limit_single_partition_is_safe(spark):
    df = _events(spark).limit(5)
    assert_no_data_scale_single_partition(df)


# Queries whose SinglePartition exchange feeds a subtree the WALKER can't
# prove bounded but the DESIGN does — each entry carries the bound:
_CATALOG_ALLOWLIST = {
    # two-phase exact order statistic: the flagged window ranks ONLY the
    # k-th rank's residual bucket (bucket occupancy, not corpus scale);
    # the bucket census that picks it is post-aggregation (walker-safe)
    "q_conformal_coverage",
    # recursive CTE (UnionLoop) on the materialized day grain: <= 366
    # rows by construction, SF-invariant after the first groupBy
    "q_forecast_backtest",
}


def test_no_data_scale_single_partition_anywhere_in_catalog(spark):
    """Catalog-wide sweep (the ADVICE r11 companion made a gate, like
    test_no_cartesian_anywhere_in_catalog): no query may serialize an
    unbounded subtree onto one partition, and — same pass, since plans
    are built anyway — no query may plan row-at-a-time Python
    (BatchEvalPython; pandas/Arrow nodes are the sanctioned Python
    path — round 12 flipped the two UDTFs to useArrow=True, closing
    the last row-path nodes). Round 12 migrated the five real
    single-partition offenders (ntile/row_number families) onto
    operators/ranks.py's distributed two-phase ranks; the allowlist
    holds only designs the WALKER cannot see are bounded, each with
    its bound stated above."""
    from kafka_stream_service_spark.queries.registry import QUERIES

    SF = "/root/testdata/sf0.001"
    bad = {}
    row_python = []
    for name, spec in QUERIES.items():
        try:
            plan = physical_plan(spec.spark_fn(spark, SF))
        except Exception:  # noqa: BLE001 - plan-only sweep
            continue
        if "BatchEvalPython" in plan and "ArrowEvalPython" not in plan:
            row_python.append(name)
        if name in _CATALOG_ALLOWLIST:
            continue
        off = single_partition_offenders(plan)
        if off:
            bad[name] = off
    assert not bad, (
        "data-scale SinglePartition collapse in: "
        f"{bad} — migrate to operators/ranks.py or justify in the allowlist"
    )
    assert not row_python, (
        f"row-at-a-time Python (BatchEvalPython) in: {row_python} — use a "
        "pandas UDF / Arrow-optimized UDTF (useArrow=True)"
    )

"""Top-k operators.

``topk_global`` relies on Spark planning ``orderBy().limit(k)`` as
TakeOrderedAndProject: each partition keeps its local k, the driver merges
p*k rows — no global sort materialization, which is the difference between
O(k) driver memory and a full shuffle at 100 TB.

``topk_per_group`` is the window row_number pattern; the shuffle is on the
group key and state per key is O(k) after the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def topk_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = W.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)

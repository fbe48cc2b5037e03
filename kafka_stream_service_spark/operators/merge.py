"""MERGE INTO semantics on plain parquet tables (no Delta/Iceberg).

Vanilla Spark has no transactional MERGE; the lakehouse maintenance
family (operators/maintenance.py: compaction, partitioned layout, schema
evolution) gets its mutation counterpart here: upsert/delete merge, SCD2
history tracking, and snapshot diffing (CDC), each expressed as plain
DataFrame algebra so Catalyst plans them as ordinary joins.

Scale shape (100 TB): a merge is ONE full-outer (or left) hash join
between the base snapshot and the (usually much smaller) changeset —
broadcast when the changeset is dim-sized, shuffle-hash otherwise, and
co-partitioned for free when both sides are bucketed by the merge key.
The rewrite-then-swap discipline from compact_partitions applies to
persisting the result; these operators only produce the merged frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Change-row operations for merge_into / scd2_apply.
OP_COL = "_op"
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_into(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply a keyed changeset to a base snapshot.

    ``changes`` carries the full new row plus an ``_op`` column:
    ``U`` (upsert: update when the key exists, insert when it doesn't)
    or ``D`` (delete). Exactly one change row per key (enforce upstream —
    the deterministic fixture changesets satisfy it by construction).

    Returns the next snapshot with base columns. Implementation: one
    full-outer join on the key; each output row picks the change side
    when present (unless it is a delete) and the base side otherwise.
    """
    data_cols = [c for c in base.columns if c != key]
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    keep: Column = F.coalesce(F.col(f"c.{OP_COL}"), F.lit("B")) != OP_DELETE
    pick = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(F.col(f"c.{OP_COL}").isNotNull(), F.col(f"c.{col}"))
            .otherwise(F.col(f"b.{col}"))
            .alias(col)
            for col in data_cols
        ],
    ]
    return joined.filter(keep).select(*pick)


def scd2_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: Column,
    far_future: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a current-state snapshot
    plus one change batch into a row-versioned history.

    Every base row becomes a version valid from ``NULL`` (unknown start —
    the fixture snapshot has no lineage) to either ``far_future`` (still
    current) or the change timestamp (superseded/deleted). Every upsert
    change opens a new current version at ``change_ts``.

    One left join (changes are keyed) + one union — the standard
    warehouse pattern, shuffle-partitioned on the key.
    """
    data_cols = [c for c in base.columns if c != key]
    far = F.lit(far_future).cast("date")
    ch = changes.alias("c")
    b = base.alias("b")
    joined = b.join(ch, F.col(f"b.{key}") == F.col(f"c.{key}"), "left")
    closed_or_open = joined.select(
        F.col(f"b.{key}").alias(key),
        *[F.col(f"b.{col}").alias(col) for col in data_cols],
        F.when(F.col(f"c.{OP_COL}").isNotNull(), change_ts).otherwise(far).alias("valid_to"),
        (F.col(f"c.{OP_COL}").isNull()).alias("is_current"),
    )
    fresh = changes.filter(F.col(OP_COL) == OP_UPSERT).select(
        F.col(key),
        *[F.col(col) for col in data_cols],
        far.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_open.unionByName(fresh)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Change-data-feed between two snapshots: one row per changed key
    with ``change_type`` in insert/update/delete and both value structs.

    One full-outer join on the key; unchanged rows (all columns equal)
    are filtered out with a null-safe struct comparison.
    """
    data_cols = [c for c in old.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    o_struct = F.struct(*[F.col(f"o.{c}").alias(c) for c in data_cols])
    n_struct = F.struct(*[F.col(f"n.{c}").alias(c) for c in data_cols])
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
        .when(~o_struct.eqNullSafe(n_struct), F.lit("update"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            change.alias("change_type"),
            o_struct.alias("old_value"),
            n_struct.alias("new_value"),
        )
        .filter(F.col("change_type").isNotNull())
    )

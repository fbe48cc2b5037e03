"""Lakehouse mutation queries: MERGE upsert/delete, SCD2 history, CDC
snapshot diff — the mutation counterpart of the maintenance family
(compaction / partitioned layout / schema evolution).

Each query derives a DETERMINISTIC changeset from the orders table
(key mod 97 selects update/delete/insert cohorts), applies the real
operator from operators/merge.py, and is hash-checked against an oracle
that states the post-merge truth directly in SQL — so a wrong join side,
a lost delete, or a duplicated insert flips the driver verdict.

Money arithmetic rides DECIMAL(12,2) (see queries/_util.py) so the
updated totals are bit-identical across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import OP_COL, OP_DELETE, OP_UPSERT, merge_into, scd2_apply, snapshot_diff
from ..tables import tables
from ._util import dec
from .registry import query

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
_INS_OFFSET = 10_000_000
_CHANGE_TS = "1998-12-01"

_NEW_PRICE_SQL = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 10 AS DOUBLE)"


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables(spark, sf_dir)["orders"].select(*_COLS)


def _changeset(base: DataFrame) -> DataFrame:
    """Deterministic changeset: key%97==1 -> price+10/status R update,
    key%97==2 -> delete, key%97==3 -> insert under a fresh key."""
    new_price = (dec("o_totalprice") + F.lit(10)).cast("double")
    upd = base.filter(F.col("o_orderkey") % 97 == 1).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        new_price.alias("o_totalprice"),
        "o_orderdate",
        F.lit(OP_UPSERT).alias(OP_COL),
    )
    dele = base.filter(F.col("o_orderkey") % 97 == 2).select(
        *_COLS, F.lit(OP_DELETE).alias(OP_COL)
    )
    ins = base.filter(F.col("o_orderkey") % 97 == 3).select(
        (F.col("o_orderkey") + _INS_OFFSET).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.lit(OP_UPSERT).alias(OP_COL),
    )
    return upd.unionByName(dele).unionByName(ins)


@query(
    "q_upsert_merge",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 97 = 1 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 97 = 1 THEN {_NEW_PRICE_SQL}
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate
    FROM orders WHERE o_orderkey % 97 <> 2
    UNION ALL
    SELECT o_orderkey + {_INS_OFFSET}, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey % 97 = 3
    """,
    tags=("lakehouse", "merge", "cdc"),
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on a parquet snapshot: one full-outer join applies a
    keyed changeset (updates + deletes + inserts) and yields the next
    snapshot. The oracle states the post-merge table directly, so any
    merge defect (lost delete, unapplied update, doubled insert) breaks
    the hash. Changeset is ~3% of the base — the broadcast-side shape at
    scale; here the join hash-partitions on the merge key."""
    base = _base(spark, sf_dir)
    return merge_into(base, _changeset(base), "o_orderkey")


@query(
    "q_scd2_history",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           CASE WHEN o_orderkey % 97 IN (1, 2) THEN '{_CHANGE_TS}'
                ELSE '9999-12-31' END AS valid_to,
           o_orderkey % 97 NOT IN (1, 2) AS is_current
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_custkey, 'R', {_NEW_PRICE_SQL}, o_orderdate,
           '9999-12-31', TRUE
    FROM orders WHERE o_orderkey % 97 = 1
    UNION ALL
    SELECT o_orderkey + {_INS_OFFSET}, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, '9999-12-31', TRUE
    FROM orders WHERE o_orderkey % 97 = 3
    """,
    tags=("lakehouse", "scd2", "cdc"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: the same changeset applied as
    history — superseded/deleted versions close at the change date,
    updates and inserts open as current. One left join + one union."""
    base = _base(spark, sf_dir)
    hist = scd2_apply(
        base,
        _changeset(base),
        "o_orderkey",
        change_ts=F.lit(_CHANGE_TS).cast("date"),
    )
    # valid_to rides as an ISO string: the 9999-12-31 sentinel overflows
    # pandas datetime64[ns] on the DuckDB side, which would make the two
    # engines stringify the same date differently in the compare
    return hist.withColumn("valid_to", F.col("valid_to").cast("string"))


@query(
    "q_cdc_snapshot_diff",
    oracle=f"""
    SELECT o_orderkey, 'update' AS change_type,
           o_totalprice AS old_totalprice,
           {_NEW_PRICE_SQL} AS new_totalprice
    FROM orders WHERE o_orderkey % 97 = 1
    UNION ALL
    SELECT o_orderkey, 'delete', o_totalprice, NULL
    FROM orders WHERE o_orderkey % 97 = 2
    UNION ALL
    SELECT o_orderkey + {_INS_OFFSET}, 'insert', NULL, o_totalprice
    FROM orders WHERE o_orderkey % 97 = 3
    """,
    tags=("lakehouse", "cdc", "diff"),
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two snapshots: full-outer join with a
    null-safe struct comparison classifies every key as
    insert/update/delete, unchanged keys vanish. Applied to
    (orders, merged orders), the diff must be exactly the changeset the
    merge consumed — a self-consistency check pairing q_upsert_merge."""
    base = _base(spark, sf_dir)
    merged = merge_into(base, _changeset(base), "o_orderkey")
    d = snapshot_diff(base, merged, "o_orderkey")
    return d.select(
        "o_orderkey",
        "change_type",
        F.col("old_value.o_totalprice").alias("old_totalprice"),
        F.col("new_value.o_totalprice").alias("new_totalprice"),
    )


_V2_TS = "1996-01-01"


@query(
    "q_scd2_point_in_time_join",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(CASE WHEN c.c_custkey % 5 = 0
                      AND o.o_orderdate >= TIMESTAMP '{_V2_TS}'
                     THEN CAST(c.c_acctbal AS DECIMAL(12,2)) + 100
                     ELSE CAST(c.c_acctbal AS DECIMAL(12,2)) END AS DOUBLE)
             AS bal_at_order
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("lakehouse", "scd2", "temporal", "join"),
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME lookup against a versioned dimension — the standard
    warehouse query over SCD2 history (q_scd2_history builds such
    history; this consumes one): every fact row joins the dimension
    version that was valid AT ITS OWN timestamp, via
    ``fact.ts >= valid_from AND fact.ts < valid_to``. The versioned
    dimension is built deterministically (every 5th customer re-versions
    at {_V2_TS} with +100 balance), and the oracle states the effective
    balance per order analytically — picking the wrong version, leaking
    a row into two versions (half-open interval bug), or dropping
    single-version customers all flip the hash.

    Scale shape: the version table is dimension-sized x version count —
    broadcast, so the fact side never shuffles and the interval
    predicate evaluates map-side (the theta part of a broadcast range
    join). Versions are HALF-OPEN [from, to): exactly one version
    matches any timestamp, which the row-count equality with the plain
    FK join proves every round.
    """
    t = tables(spark, sf_dir)
    c = t["customer"]
    far, epoch = "9999-12-31", "0001-01-01"
    v2_key = F.col("c_custkey") % 5 == 0
    v1 = c.select(
        "c_custkey",
        dec("c_acctbal").alias("bal"),
        F.lit(epoch).cast("timestamp").alias("valid_from"),
        F.when(v2_key, F.lit(_V2_TS)).otherwise(F.lit(far)).cast("timestamp").alias("valid_to"),
    )
    v2 = c.filter(v2_key).select(
        "c_custkey",
        (dec("c_acctbal") + 100).alias("bal"),
        F.lit(_V2_TS).cast("timestamp").alias("valid_from"),
        F.lit(far).cast("timestamp").alias("valid_to"),
    )
    versions = v1.unionByName(v2)
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        o.join(
            F.broadcast(versions),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("o_orderdate") < F.col("valid_to")),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("bal").cast("double").alias("bal_at_order"),
        )
    )


@query(
    "q_snapshot_time_travel",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS v
      FROM orders WHERE o_orderkey % 4 = 1
    ),
    epoch1 AS (
      SELECT k, CASE WHEN k % 8 = 1 THEN v + 5 ELSE v END AS v
      FROM base WHERE k % 12 != 1
      UNION ALL
      SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS v
      FROM orders WHERE o_orderkey % 4 = 2 AND o_orderkey % 7 = 0
    )
    SELECT 'epoch0' AS as_of, k, CAST(v AS DOUBLE) AS v FROM base
    UNION ALL
    SELECT 'epoch1' AS as_of, k, CAST(v AS DOUBLE) AS v FROM epoch1
    """,
    tags=("lakehouse", "time-travel", "merge"),
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation time travel on the MERGE sink: commit an
    initial keyed snapshot (epoch 0), apply a mixed CDC changeset
    (updates +5, deletes, inserts — epoch 1), then read BOTH epochs
    back — the historical read must still show the pre-changeset table
    byte-for-byte while the current read shows the post-merge table.
    The oracle states both epochs algebraically, so a mutated history
    (epoch-0 dir touched by the epoch-1 merge), a lost delete, or a
    stale pointer all flip the hash.

    History is a free by-product of the writer's commit protocol:
    immutable per-epoch directories + atomic pointer swap
    (eos.MergeIdempotentSnapshotWriter.snapshot_at) — the same
    mechanism Delta/Iceberg call snapshot isolation. Scale shape: one
    keyed merge join per epoch (changeset-sized side broadcastable);
    a time-travel read is a plain scan of one immutable directory, no
    log replay.
    """
    from ..eos import MergeIdempotentSnapshotWriter
    from ._util import work_dir

    o = tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey")
    base = o.filter(k % 4 == 1).select(
        k.alias("k"), dec("o_totalprice").alias("v"), F.lit("U").alias("_op")
    )
    changes = (
        o.filter(
            ((k % 4 == 1) & ((k % 8 == 1) | (k % 12 == 1)))
            | ((k % 4 == 2) & (k % 7 == 0))
        )
        .select(
            k.alias("k"),
            F.when(k % 12 == 1, F.lit(None).cast("decimal(12,2)"))
            .when(k % 8 == 1, dec("o_totalprice") + 5)
            .otherwise(dec("o_totalprice"))
            .cast("decimal(12,2)")
            .alias("v"),
            F.when(k % 12 == 1, F.lit("D")).otherwise(F.lit("U")).alias("_op"),
        )
    )
    writer = MergeIdempotentSnapshotWriter(
        os.path.join(work_dir("ttravel", sf_dir), "tbl"), key="k"
    )
    writer(base, 0)
    writer(changes, 1)
    hist = writer.snapshot_at(spark, 0).select(
        F.lit("epoch0").alias("as_of"), "k", F.col("v").cast("double").alias("v")
    )
    cur = writer.current(spark).select(
        F.lit("epoch1").alias("as_of"), "k", F.col("v").cast("double").alias("v")
    )
    return hist.unionByName(cur)

"""Small-file compaction: fewer files, identical data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kafka_stream_service_spark.operators.maintenance import compact_parquet, directory_bytes
from kafka_stream_service_spark.tables import tables

SF = "/root/testdata/sf0.01"


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    # simulate a micro-batch-fragmented sink: 64 tiny files
    ev = tables(spark, SF)["events"].select("event_id", "event_type", "value")
    src = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    # target sized so the whole table fits a handful of files
    total = directory_bytes(spark, src)
    back = compact_parquet(spark, src, dst, target_file_bytes=max(total // 3, 1))
    n_out = len(glob.glob(dst + "/*.parquet"))
    assert n_out <= 4, f"expected <=4 compacted files, got {n_out}"

    # compaction must be invisible to readers: same rows, same aggregates
    a = ev.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum(F.hash("event_type", "event_id"))
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum(F.hash("event_type", "event_id"))
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_compaction_splits_when_source_too_coarse(spark, tmp_path):
    # 1 giant partition + tiny target => repartition path (shuffle split)
    ev = tables(spark, SF)["events"].select("event_id", "value")
    src = str(tmp_path / "one_file")
    ev.coalesce(1).write.parquet(src)
    dst = str(tmp_path / "split")
    total = directory_bytes(spark, src)
    back = compact_parquet(spark, src, dst, target_file_bytes=max(total // 4, 1))
    assert len(glob.glob(dst + "/*.parquet")) >= 2
    assert back.count() == ev.count()


def test_compact_parquet_rejects_in_place(spark, tmp_path):
    src = str(tmp_path / "t")
    tables(spark, SF)["region"].write.parquet(src)
    import pytest

    with pytest.raises(ValueError, match="in-place"):
        compact_parquet(spark, src, src)


def test_partition_aware_plan_and_swap(spark, tmp_path):
    """plan_compaction flags only the fragmented partition of a
    Hive-partitioned tree; compact_partitions swaps it in place while the
    healthy partition keeps its exact files, and the full-tree read
    (partition column included) is unchanged."""
    import glob as g

    from kafka_stream_service_spark.operators.maintenance import (
        compact_partitions,
        plan_compaction,
    )

    ev = tables(spark, SF)["events"].select("event_id", "event_type", "value")
    frag = ev.filter(F.col("event_type") == "click").repartition(32)
    healthy = ev.filter(F.col("event_type") == "purchase").coalesce(1)
    root = str(tmp_path / "tree")
    frag.write.parquet(root + "/event_type=click")
    healthy.write.parquet(root + "/event_type=purchase")
    before = spark.read.parquet(root)
    want = before.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum(F.hash("event_type", "event_id"))
    ).collect()[0]
    healthy_files = sorted(g.glob(root + "/event_type=purchase/*.parquet"))

    total_click = sum(
        __import__("os").path.getsize(f)
        for f in g.glob(root + "/event_type=click/*.parquet")
    )
    plans = plan_compaction(spark, root, target_file_bytes=max(total_click // 2, 1))
    by_leaf = {p.path.rsplit("/", 1)[-1]: p for p in plans}
    assert by_leaf["event_type=click"].needs_compaction
    assert by_leaf["event_type=click"].n_files == 32
    assert not by_leaf["event_type=purchase"].needs_compaction

    done = compact_partitions(spark, plans)
    assert [p.path.rsplit("/", 1)[-1] for p in done] == ["event_type=click"]
    n_click = len(g.glob(root + "/event_type=click/*.parquet"))
    assert n_click <= by_leaf["event_type=click"].n_target_files
    # the healthy partition is byte-identical (same file names, untouched)
    assert sorted(g.glob(root + "/event_type=purchase/*.parquet")) == healthy_files
    # reader-invisible across the whole tree, partition column intact
    after = spark.read.parquet(root)
    got = after.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum(F.hash("event_type", "event_id"))
    ).collect()[0]
    assert tuple(got) == tuple(want)
    assert g.glob(root + "/event_type=click.__compact_staging__") == []
    assert g.glob(root + "/event_type=click.__compact_old__") == []


class TestMergeOperators:
    """operators/merge.py: MERGE INTO / SCD2 / snapshot-diff edge cases
    the fixture changesets don't exercise."""

    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
        )

    def test_merge_upsert_update_insert_delete(self, spark):
        from kafka_stream_service_spark.operators.merge import merge_into

        changes = spark.createDataFrame(
            [
                (2, "B", 22.0, "U"),   # update existing
                (4, "d", 40.0, "U"),   # insert new key
                (3, None, None, "D"),  # delete existing
                (9, None, None, "D"),  # delete of absent key: no-op row
            ],
            "k int, s string, v double, _op string",
        )
        got = {r.k: (r.s, r.v) for r in merge_into(self._base(spark), changes, "k").collect()}
        assert got == {1: ("a", 10.0), 2: ("B", 22.0), 4: ("d", 40.0)}

    def test_merge_empty_changeset_is_identity(self, spark):
        from kafka_stream_service_spark.operators.merge import merge_into

        empty = spark.createDataFrame([], "k int, s string, v double, _op string")
        base = self._base(spark)
        assert sorted(merge_into(base, empty, "k").collect()) == sorted(base.collect())

    def test_scd2_versions(self, spark):
        from pyspark.sql import functions as F

        from kafka_stream_service_spark.operators.merge import scd2_apply

        changes = spark.createDataFrame(
            [(2, "B", 22.0, "U"), (3, None, None, "D"), (5, "e", 50.0, "U")],
            "k int, s string, v double, _op string",
        )
        hist = scd2_apply(
            self._base(spark), changes, "k", change_ts=F.lit("2020-01-01").cast("date")
        ).collect()
        by_key = {}
        for r in hist:
            by_key.setdefault(r.k, []).append(r)
        # untouched key: one open version
        assert [str(r.valid_to) for r in by_key[1]] == ["9999-12-31"]
        # updated key: closed old version + open new version
        assert sorted(str(r.valid_to) for r in by_key[2]) == ["2020-01-01", "9999-12-31"]
        assert {r.is_current for r in by_key[2]} == {False, True}
        # deleted key: closed version only
        assert [(str(r.valid_to), r.is_current) for r in by_key[3]] == [("2020-01-01", False)]
        # inserted key: open version only
        assert [(str(r.valid_to), r.v) for r in by_key[5]] == [("9999-12-31", 50.0)]

    def test_snapshot_diff_classification(self, spark):
        from kafka_stream_service_spark.operators.merge import snapshot_diff

        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 22.0), (4, "d", 40.0)], "k int, s string, v double"
        )
        d = {r.k: r.change_type for r in snapshot_diff(self._base(spark), new, "k").collect()}
        # key 1 unchanged -> absent; 2 update; 3 delete; 4 insert
        assert d == {2: "update", 3: "delete", 4: "insert"}

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

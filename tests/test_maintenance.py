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

"""Audit every catalog query for array/map/struct-typed OUTPUT columns.

The driver's canonicalizer sorts the pandas result by all columns, which
raises `TypeError: unhashable type: 'list'` on list-valued cells. Every
query therefore must emit only atomic (driver-hashable) columns. This tool
prints offenders so they can be serialized (array_join / to_json).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry
from kafka_stream_service_spark.session import get_spark


def main() -> int:
    spark = get_spark()
    sf_dir = "/root/testdata/sf0.001"
    bad = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            bad.append(name)
            continue
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            print(f"BAD  {name}: {complex_cols}")
            bad.append(name)
    print(f"\n{len(bad)} queries with complex/erroring outputs" if bad else "\nall clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Synthetic ~sf1 scaling-probe dataset + 8-vs-32-core probe runner
(VERDICT r15 next-steps #6).

The driver's 8-vs-32-core panel is uninformative at sf0.1: per-row walls
are 0.1-4.6 s, dominated by fixed per-query costs, so every ratio ≈ 1.
There is no driver-provided sf1 fixture (``/root/testdata`` is read-only,
sf ≤ 0.1), so this tool MANUFACTURES a 10x dataset purely for a SCALE.md
parallelism measurement — it is never used by bench.py, the oracle
harness, or any query default, and nothing derived from it is cached or
reused across runs.

Scaling recipe (10 shifted copies, deterministic):

- fact tables (lineitem, orders, customer, supplier, part, events,
  documents, embeddings): copy i shifts every entity key by
  i * KEY_OFFSET so joins fan out consistently (an order's lineitems
  stay attached to it, a user's events stay theirs);
- ``documents.text``: every token is prefixed with a per-copy tag, so
  shingles/trigrams are COPY-LOCAL — without this, duplicating text 10x
  multiplies every shingle's document frequency by 10 and the
  rare-shingle graph family (DF in 2..4) would collapse to an empty
  workload instead of a 10x one. With the tag, each copy reproduces the
  original shingle/graph structure, so the probe runs 10 disjoint copies
  of the sf0.1 workload — exactly the shape a bigger fixture would have;
- dimension tables (region, nation) are copied as-is (they are
  dimension-like at every SF).

Usage:
  python tools/scale_probe.py build /tmp/sf1probe
  SPARK_GRAFT_CPUS=32 python tools/scale_probe.py run /tmp/sf1probe \
      q_label_propagation q_jaccard_prefix_join ... >> /tmp/probe32.jsonl
"""

from __future__ import annotations

import json
import sys
import time

KEY_OFFSET = 100_000_000
COPIES = 10
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(out_dir: str) -> None:
    import os

    from pyspark.sql import functions as F

    from kafka_stream_service_spark.session import get_spark
    from kafka_stream_service_spark.tables import tables

    spark = get_spark("scale_probe_build")
    t = tables(spark, "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        t[name].write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in KEYS.items():
        df = t[name]
        copies = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast("bigint"))
            if name == "documents":
                # per-copy token tag => copy-local shingles (see module doc)
                tag = f"c{i}x"
                c = c.withColumn(
                    "text", F.concat(F.lit(tag), F.regexp_replace("text", " ", f" {tag}"))
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"built {name}", flush=True)
    spark.stop()


def run(sf_dir: str, names: list[str]) -> None:
    from kafka_stream_service_spark.queries import QUERIES
    from kafka_stream_service_spark.session import cpu_count, get_spark

    spark = get_spark("scale_probe_run")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(QUERIES["q02_revenue_by_nation"].spark_fn(spark, sf_dir))  # warmup
    out: dict[str, float] = {}
    for name in names:
        ts = []
        for _ in range(2):
            t0 = time.time()
            force(QUERIES[name].spark_fn(spark, sf_dir))
            ts.append(round(time.time() - t0, 3))
        out[name] = min(ts)
    print(json.dumps({"cpus": cpu_count(), "timings": out}))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    mode = sys.argv[1]
    if mode == "build":
        build(sys.argv[2])
    else:
        run(sys.argv[2], sys.argv[3:])

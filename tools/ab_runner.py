"""One whole-process leg of the r8-vs-r9 interleaved A/B (VERDICT r9 #4).

Runs the shared-55 headline rows (names from a JSON list) against the
code in a given worktree, with bench.py's exact methodology — one
flagship warmup, 3 timed passes in fixed order, GC reclaim every 12
queries, per-row MEDIAN — and appends one JSON line {row: median} to the
output file. The orchestrator (tools/ab_bench.sh) alternates worktrees
ABABAB so host drift averages out of the comparison instead of landing
on one side.

Usage: python tools/ab_runner.py <worktree> <shared_names.json> <out.jsonl>
"""

from __future__ import annotations

import gc
import json
import sys
import time


def main() -> None:
    worktree, names_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, worktree)
    names = json.load(open(names_path))

    from kafka_stream_service_spark.queries import QUERIES
    from kafka_stream_service_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("ab_leg")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(QUERIES["q02_revenue_by_nation"].spark_fn(spark, sf_dir))
    force(
        spark.range(spark.sparkContext.defaultParallelism * 2)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, schema="id long")
    )

    def reclaim() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for qi, name in enumerate(names):
            if qi % 12 == 0:
                reclaim()
            t0 = time.time()
            force(QUERIES[name].spark_fn(spark, sf_dir))
            runs[name].append(round(time.time() - t0, 3))
        reclaim()
    medians = {n: sorted(ts)[len(ts) // 2] for n, ts in runs.items()}
    with open(out_path, "a") as f:
        f.write(json.dumps({"worktree": worktree, "medians": medians}) + "\n")
    print(f"leg done: {worktree} total={round(sum(medians.values()), 1)}s")
    spark.stop()


if __name__ == "__main__":
    main()

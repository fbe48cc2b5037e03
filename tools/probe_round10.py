"""Replication probe for the round-10 operators (same x1/x4/x16
disjoint-shard methodology as probe_round8/probe_round9; reuses
probe_round9.build — per-copy token prefixes on documents so growth
measures corpus size, not duplicate hot buckets). Slopes land in
SCALE.md's round-10 section.

Probed: q_exact_substr_spans (shingle census + doc-partitioned span
merge), q_exact_substr_stats (manifest rollup), q_pair_index_snapshot
(banded-LSH build + parquet write).

q_semdedup_prune is NOT probed: build() does not shard the embeddings
table (x16 copies rely on token-prefixed documents / key-offset
orders+lineitem), so a probe would measure an unchanged input under a
busier host. Its data-scaling argument is structural — intra-cluster
pair blocks stay bounded because SemDeDup picks k proportional to n
(documented in the query docstring).

Usage: python tools/probe_round10.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from probe_round9 import build  # noqa: E402  (shared shard builder)

PROBES = [
    "q_exact_substr_spans",
    "q_exact_substr_stats",
    "q_pair_index_snapshot",
    # batch 2 (documents/lineitem shard with build(); embeddings-bound
    # q_power_iteration / q_semdedup are excluded per the note above)
    "q_pair_index_delta",
    "q_weighted_sample_es",
    "q_mann_kendall_trend",
]


def main() -> None:
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.session import get_spark

    spark = get_spark("probe_round10")
    dirs = {m: build(m) for m in (1, 4, 16)}
    for name in PROBES:  # warm plan/JVM caches so x1 isn't charged spin-up
        QUERIES[name].spark_fn(spark, dirs[1]).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in PROBES:
        fn = QUERIES[name].spark_fn
        row = {}
        for mult in (1, 4, 16):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, dirs[mult]).write.format("noop").mode("overwrite").save()
                best = min(best or 9e9, time.time() - t0)
            row[mult] = round(best, 2)
        slope = round(row[16] / row[1], 1)
        print(
            f"PROBE {name}: x1={row[1]}s x4={row[4]}s x16={row[16]}s -> {slope}x at 16x data"
        )
    spark.stop()


if __name__ == "__main__":
    main()

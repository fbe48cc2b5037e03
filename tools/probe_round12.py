"""Replication probe for the round-12 incremental IVF refresh (x1/x4/x16).

Reuses probe_round11's embeddings shard builder (sign-flip copies:
within-copy duplicate structure preserved, ~no cross-copy pairs, int8
magnitudes unchanged). Steady-state framing: the BASE IVF artifact
exists at every scale before any probe is timed — a refresh probes an
index built at the previous snapshot.

Probed: q_knn_ivf_refresh (delta assigns to STORED centroids read from
the artifact, census over touched lists only) vs the naive comparator a
non-incremental pipeline pays — full corpus re-assignment + the same
touched-list census (the in-engine rebuild from
tests/test_round12.py::test_ivf_refresh_merge_equals_rebuild...).

Same K-fixed caveat as probe_round11: with K=8 module-constant
centroids, list occupancy grows linearly with the multiplier, so BOTH
legs inherit a linear term from touched-list size; the probe-vs-rebuild
RATIO (what the incremental shape buys — skipping the 90% non-delta
assignment work) is the headline number.

Usage: python tools/probe_round12.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.probe_round11 import build  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_stream_service_spark.queries.clustering import _assignments
    from kafka_stream_service_spark.queries.corpus_ops import _quantized
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.queries.round10b import _DELTA_MOD, _DELTA_REM
    from kafka_stream_service_spark.queries.round12 import build_ivf_base_index
    from kafka_stream_service_spark.session import get_spark
    from kafka_stream_service_spark.tables import tables

    spark = get_spark("probe_round12")

    def full_rebuild_census(sf_dir: str):
        e = _quantized(tables(spark, sf_dir)["embeddings"])
        nrm = F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.col("qv"),
                lambda a, b: a.cast("bigint") * b.cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        full = _assignments(spark, sf_dir).join(
            e.select("vec_id", "qv"), "vec_id"
        ).select("vec_id", "centroid_id", "dist2", nrm.alias("nrm"))
        touched = (
            full.filter((F.col("vec_id") % _DELTA_MOD) == _DELTA_REM)
            .select("centroid_id")
            .distinct()
        )
        return (
            full.join(F.broadcast(touched), "centroid_id")
            .groupBy("centroid_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_members"),
                F.sum(((F.col("vec_id") % _DELTA_MOD) == _DELTA_REM).cast("int"))
                .cast("bigint")
                .alias("n_delta"),
                F.sum("dist2").cast("bigint").alias("sum_dist2"),
                F.sum("nrm").cast("bigint").alias("sum_nrm"),
            )
        )

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    dirs = {m: build(m) for m in (1, 4, 16)}
    for m in (1, 4, 16):
        build_ivf_base_index(spark, dirs[m])
    # warmup
    force(QUERIES["q_knn_ivf_refresh"].spark_fn(spark, dirs[1]))
    force(full_rebuild_census(dirs[1]))

    legs = {
        "q_knn_ivf_refresh": lambda d: QUERIES["q_knn_ivf_refresh"].spark_fn(spark, d),
        "full_rebuild_census": full_rebuild_census,
    }
    print("query                     x1      x4      x16    slope")
    rows = {}
    for name, fn in legs.items():
        row = {}
        for mult in (1, 4, 16):
            best = None
            for _ in range(2):
                t0 = time.time()
                force(fn(dirs[mult]))
                best = min(best or 9e9, time.time() - t0)
            row[mult] = round(best, 2)
        rows[name] = row
        print(
            f"{name:<25} {row[1]:<7} {row[4]:<7} {row[16]:<7}"
            f" {round(row[16] / row[1], 1)}x"
        )
    for m in (1, 4, 16):
        ratio = round(
            rows["full_rebuild_census"][m] / rows["q_knn_ivf_refresh"][m], 1
        )
        print(f"x{m}: rebuild / refresh-probe = {ratio}x")


if __name__ == "__main__":
    main()

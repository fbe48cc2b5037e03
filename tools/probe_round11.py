"""Replication probe for the round-11 incremental SemDeDup (x1/x4/x16).

The shared probe_round9.build shards documents/lineitem/orders but NOT
embeddings, so embedding-bound ops were never probed (probe_round10
docstring). This probe adds an embeddings shard builder: per-copy
vec_id offsets (offset % 10 == 0 keeps the delta residue intact) plus a
deterministic per-(copy, dim) SIGN FLIP of each component. Within a
copy the sign pattern cancels in every dot product (dot(s∘u, s∘v) =
dot(u, v)), so each copy reproduces the base corpus's duplicate
structure exactly; across copies the flipped signs scatter cosines
around 0, so copies contribute ~no cross-copy near-dup pairs — growth
measures corpus size, not an artificial all-copies-mutually-duplicate
blowup. Quantization is sign-symmetric (scale uses |x|), so the int8
pipeline sees the same magnitudes.

Caveat the numbers carry: K (=8 centroids) is a module constant, so
cluster occupancy grows linearly with the multiplier — the k-FIXED
worst case. SemDeDup's production contract picks k proportional to n
precisely to keep blocks bounded (paper: 50k clusters for LAION-440M);
the full-recompute slope here therefore overstates the production
exponent, and the probe-vs-recompute RATIO (what the incremental shape
buys) is the headline number.

Probed: q_semdedup_delta_edges (stored-index probe, index built before
timing — the steady-state refresh cost) vs q_semdedup_prune (the full
recompute).

Usage: python tools/probe_round11.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"
TMP = Path("/tmp/kssp_probe_r11")


def build(mult: int) -> str:
    out = TMP / f"x{mult}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    con = duckdb.connect()
    emb = " UNION ALL ".join(
        f"""SELECT vec_id + {k} * 1000000 AS vec_id,
                   list_transform(range(1, len(embedding) + 1),
                     i -> embedding[i] * (CASE WHEN
                       CAST(('0x' || substr(md5({k} || ':' || i), 1, 2)) AS INT) % 2 = 0
                       THEN 1 ELSE -1 END)) AS embedding,
                   label
            FROM read_parquet('{BASE}/embeddings.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({emb}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    for f in os.listdir(BASE):
        if f != "embeddings.parquet":
            os.symlink(os.path.join(BASE, f), out / f)
    return str(out)


def main() -> None:
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.queries.round11 import build_sem_index
    from kafka_stream_service_spark.session import get_spark

    spark = get_spark("probe_round11")
    dirs = {m: build(m) for m in (1, 4, 16)}
    # Steady-state framing: the index exists before any probe is timed
    # (a refresh probes an index built at the previous snapshot).
    for m in (1, 4, 16):
        build_sem_index(spark, dirs[m])
    for name in ("q_semdedup_delta_edges", "q_semdedup_prune"):
        QUERIES[name].spark_fn(spark, dirs[1]).write.format("noop").mode(
            "overwrite"
        ).save()
    print("query                     x1      x4      x16    slope")
    rows = {}
    for name in ("q_semdedup_delta_edges", "q_semdedup_prune"):
        fn = QUERIES[name].spark_fn
        row = {}
        for mult in (1, 4, 16):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, dirs[mult]).write.format("noop").mode("overwrite").save()
                best = min(best or 9e9, time.time() - t0)
            row[mult] = round(best, 2)
        rows[name] = row
        print(
            f"{name:<25} {row[1]:<7} {row[4]:<7} {row[16]:<7}"
            f" {round(row[16] / row[1], 1)}x"
        )
    r = rows
    for m in (1, 4, 16):
        ratio = round(
            r["q_semdedup_prune"][m] / r["q_semdedup_delta_edges"][m], 1
        )
        print(f"x{m}: recompute / delta-probe = {ratio}x")


if __name__ == "__main__":
    main()

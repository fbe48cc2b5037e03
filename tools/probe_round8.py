"""Replication probe for the round-8 data-scale operators (SCALE.md
methodology, same as probe_ppjoin): build x1/x4/x16 copies of sf0.1
inputs as DISJOINT shards — documents get per-copy token prefixes (no
shared shingles across copies, so growth measures corpus size, not an
all-duplicates hot bucket), embeddings get vec_id offsets, lineitem
gets orderkey offsets — and time each query at each multiple.

Probed: q_dedup_incremental_snapshot (LSH probe join),
q_label_propagation (iterative graph), q_ann_rerank_two_stage
(broadcast shortlist + exact re-rank), q_spearman_rho (histogram-grain
rank transform).

Usage: python tools/probe_round8.py
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
TMP = Path("/tmp/probe_round8")

PROBES = [
    "q_dedup_incremental_snapshot",
    "q_label_propagation",
    "q_ann_rerank_two_stage",
    "q_spearman_rho",
]


def build(mult: int) -> str:
    out = TMP / f"x{mult}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    con = duckdb.connect()
    docs = " UNION ALL ".join(
        f"""SELECT doc_id + {k} * 1000000 AS doc_id,
                   regexp_replace(text, '([^ ]+)', 'c{k}_\\1', 'g') AS text,
                   lang, source, n_chars
            FROM read_parquet('{BASE}/documents.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({docs}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    emb = " UNION ALL ".join(
        f"""SELECT vec_id + {k} * 1000000 AS vec_id, embedding, label
            FROM read_parquet('{BASE}/embeddings.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({emb}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    li = " UNION ALL ".join(
        f"""SELECT l_orderkey + {k} * 100000000 AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{BASE}/lineitem.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({li}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    con.close()
    for f in os.listdir(BASE):
        if f not in ("documents.parquet", "embeddings.parquet", "lineitem.parquet"):
            os.symlink(os.path.join(BASE, f), out / f)
    return str(out)


def main() -> None:
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.session import get_spark

    spark = get_spark("probe_round8")
    dirs = {m: build(m) for m in (1, 4, 16)}
    # warm plan/JVM caches so x1 isn't charged spin-up
    for name in PROBES:
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
        print(f"PROBE {name}: x1={row[1]}s x4={row[4]}s x16={row[16]}s -> {slope}x at 16x data")
    spark.stop()


if __name__ == "__main__":
    main()

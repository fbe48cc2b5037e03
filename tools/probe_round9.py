"""Replication probe for the round-9 operators (same x1/x4/x16
disjoint-shard methodology as probe_round8/probe_ppjoin): documents get
per-copy token prefixes (no shared shingles/vocab across copies — growth
measures corpus size, not a duplicate hot bucket), lineitem/orders get
key offsets. Slopes land in SCALE.md's round-9 section.

Probed: q_ccnet_perplexity_buckets (LM train + broadcast score +
distributed rank), q_dsir_importance_weights (bucket histograms +
broadcast weights), q_gopher_quality_rules (scan + doc-grain census),
q_chrf_pair_fscore (endpoint-pruned trigram overlap),
q_hits_two_iterations (edge joins), q_welch_ttest (single-scan moments).

Usage: python tools/probe_round9.py
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
TMP = Path("/tmp/probe_round9")

PROBES = [
    "q_ccnet_perplexity_buckets",
    "q_dsir_importance_weights",
    "q_gopher_quality_rules",
    "q_chrf_pair_fscore",
    "q_hits_two_iterations",
    "q_welch_ttest",
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
    li = " UNION ALL ".join(
        f"""SELECT l_orderkey + {k} * 100000000 AS l_orderkey,
                   l_partkey, l_suppkey + {k} * 1000000 AS l_suppkey,
                   l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{BASE}/lineitem.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({li}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    o = " UNION ALL ".join(
        f"""SELECT o_orderkey + {k} * 100000000 AS o_orderkey,
                   o_custkey + {k} * 10000000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{BASE}/orders.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({o}) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    con.close()
    replicated = ("documents.parquet", "lineitem.parquet", "orders.parquet")
    for f in os.listdir(BASE):
        if f not in replicated:
            os.symlink(os.path.join(BASE, f), out / f)
    return str(out)


def main() -> None:
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.session import get_spark

    spark = get_spark("probe_round9")
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

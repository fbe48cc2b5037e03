"""Replication probe for q_jaccard_prefix_join (SCALE.md methodology).

Builds x1/x4/x16 copies of sf0.1 `documents` with per-copy token
prefixes (copies share no shingles — measures corpus growth, not an
all-duplicates hot bucket), then times the query at each multiple.
Round 6 measured 2.62 / 6.92 / 19.0 s (7.3x at 16x data) with prefix +
length filters only; round 7 adds PPJoin's positional filter and this
script re-measures the same curve.

Usage: python tools/probe_ppjoin.py
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
TMP = Path("/tmp/probe_ppjoin")


def build(mult: int) -> str:
    out = TMP / f"x{mult}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    # Disjoint vocabulary per copy: every token gets a copy prefix.
    con = duckdb.connect()
    parts = " UNION ALL ".join(
        f"""SELECT doc_id + {k} * 1000000 AS doc_id,
                   regexp_replace(text, '([^ ]+)', 'c{k}_\\1', 'g') AS text,
                   lang, source, n_chars
            FROM read_parquet('{BASE}/documents.parquet')"""
        for k in range(mult)
    )
    con.execute(f"COPY ({parts}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    for f in os.listdir(BASE):
        if f != "documents.parquet":
            os.symlink(os.path.join(BASE, f), out / f)
    return str(out)


def main() -> None:
    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.session import get_spark

    spark = get_spark()
    fn = QUERIES["q_jaccard_prefix_join"].spark_fn
    # warm the session/plan caches once so x1 isn't charged JVM spin-up
    fn(spark, build(1)).count()
    results = {}
    for mult in (1, 4, 16):
        d = build(mult)
        t0 = time.monotonic()
        n = fn(spark, d).count()
        results[mult] = time.monotonic() - t0
        print(f"x{mult}: {results[mult]:.2f} s  ({n} pairs)", flush=True)
    print(
        f"16x data -> {results[16] / results[1]:.1f}x time "
        f"(round-6 pre-positional-filter: 7.3x)"
    )


if __name__ == "__main__":
    main()

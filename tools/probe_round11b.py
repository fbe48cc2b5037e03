"""Replication probe for the round-11 incremental text-index refresh
(x1/x4/x16, documents-only shards): per-copy token PREFIXES (the
probe_round9 builder) keep vocabularies disjoint across copies, so both
the delta slice and the touched vocabulary grow linearly with the
multiplier — the honest worst case for a refresh (real web crawls
share most vocabulary, so production touched-token counts grow far
slower than corpus size).

Timed per multiplier, steady-state (base artifact built OUTSIDE the
timed region, exactly like probe_round11's semantic-index probe):
- refresh: q_text_index_delta — stored-base census read + fresh delta
  postings + token-grain merge;
- rebuild: the full-corpus census derivation (the oracle's work, run
  in Spark) — what a refresh would cost without the stored base.

Usage: python tools/probe_round11b.py
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"
TMP = Path("/tmp/kssp_probe_r11b")


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
    con.close()
    return str(out)


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_stream_service_spark.queries.registry import QUERIES
    from kafka_stream_service_spark.queries.round11n import build_text_base_index
    from kafka_stream_service_spark.session import get_spark
    from kafka_stream_service_spark.tables import tables

    spark = get_spark()

    def rebuild_census(sf_dir: str) -> None:
        d = tables(spark, sf_dir)["documents"]
        tf = (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token", "doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )
        census = tf.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("sum_tf")
        )
        census.write.format("noop").mode("overwrite").save()

    print(f"{'mult':>5} {'refresh_s':>10} {'rebuild_s':>10} {'ratio':>7}")
    for mult in (1, 4, 16):
        sf_dir = build(mult)
        build_text_base_index(spark, sf_dir)  # steady state: base stored
        # warm both paths once (parquet footer caches, codegen)
        QUERIES["q_text_index_delta"].spark_fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        t0 = time.monotonic()
        QUERIES["q_text_index_delta"].spark_fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        refresh = time.monotonic() - t0
        rebuild_census(sf_dir)
        t0 = time.monotonic()
        rebuild_census(sf_dir)
        rebuild = time.monotonic() - t0
        print(
            f"{mult:>5} {refresh:>10.2f} {rebuild:>10.2f}"
            f" {rebuild / refresh:>7.2f}"
        )


if __name__ == "__main__":
    main()

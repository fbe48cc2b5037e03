"""Adversarial-fixture tier (VERDICT r6 next-steps #6).

The driver fixtures are clean: no NULL keys, no newline text, no ragged
arrays, no duplicate timestamps. Several catalog queries *document* a
dirty-data contract (NULL-key joins, PERMISSIVE text round-trips, RI
sweeps, deterministic tie-breaks) — until round 7 those contracts were
proven only where an ADVICE round had flagged them. This module proves
them wholesale: it rebuilds sf0.001 with injected dirt and re-runs the
full Spark-vs-DuckDB oracle comparison (the exact compare the driver
uses) on the dirty tables. A query whose dirty behavior diverges from
its oracle's fails here even though the clean-fixture gate is green.

Dirt injected:
- customer: NULL c_custkey, NULL c_nationkey, orphan c_nationkey,
  newline in c_name, NULL c_mktsegment
- orders: NULL o_custkey, orphan o_custkey, NULL o_orderpriority /
  o_orderstatus / o_totalprice / o_orderdate
- documents: NULL doc_id, NULL text, empty text, newline/tab/quote/
  backslash text, exact duplicate text under a new doc_id
- events: exact duplicate rows (duplicate timestamps), NULL event_type
  / user_id / value
- embeddings (separate dir): one ragged vector — the documented
  contract there is fail-loud, asserted as an exception
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

from tools.verify_local import compare, duck_connection

from kafka_stream_service_spark.queries.registry import QUERIES

BASE = "/root/testdata/sf0.001"

# Queries whose docstrings claim dirty-data behavior, swept oracle-exact
# over the dirty tables. (Queries that synthesize their own dirt — DLQ
# split, PERMISSIVE CSV — keep their dedicated tests.)
DIRTY_CONTRACT_QUERIES = [
    # relational dirt: NULL / orphan keys
    "q_referential_integrity",
    "q_null_safe_join",
    "q_join_full_outer",
    "q_gdpr_delete_propagation",
    "q_mode_per_group",
    # document dirt: NULL / empty / newline text, duplicate content
    "q_text_roundtrip",
    "q_text_redact_pii",
    "q_dedup_exact_hash",
    "q_dedup_keep_first",
    "q_dedup_keep_best",
    "q_text_quality_score",
    "q_text_wordcount",
    "q_chunk_documents",
    # event dirt: duplicate rows / timestamps, NULL attributes
    "q_event_dedup",
]


def _copy_with_dirt(out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "customer": """
            SELECT * FROM base
            UNION ALL SELECT NULL, 'dirty null key', 1, 0.0, 'BUILDING'
            UNION ALL SELECT 990001, 'dirty null nation', NULL, -1.5, 'AUTOMOBILE'
            UNION ALL SELECT 990002, 'dirty orphan nation', 9999, 10.0, NULL
            UNION ALL SELECT 990003, 'dirty' || chr(10) || 'newline', 2, 3.25, 'MACHINERY'
        """,
        "orders": """
            SELECT * FROM base
            UNION ALL SELECT 9900001, NULL, 'O', 100.0, TIMESTAMP '1995-01-01', NULL
            UNION ALL SELECT 9900002, 88888888, 'F', 50.0, TIMESTAMP '1995-06-01', '1-URGENT'
            UNION ALL SELECT 9900003, 1, NULL, NULL, NULL, '2-HIGH'
        """,
        "documents": """
            SELECT * FROM base
            UNION ALL SELECT NULL, 'null id tokens here', 'en', 'web', 19
            UNION ALL SELECT 980001, NULL, 'en', 'web', NULL
            UNION ALL SELECT 980002, '', 'en', NULL, 0
            UNION ALL SELECT 980003,
                'line one' || chr(10) || 'line two' || chr(9) || '"quoted" back\\slash',
                'de', 'books', 38
            UNION ALL SELECT 980004, text, lang, source, n_chars
                FROM base WHERE doc_id = (SELECT MIN(doc_id) FROM base)
        """,
        "events": """
            SELECT * FROM base
            UNION ALL SELECT * FROM base
                WHERE event_id <= (SELECT MIN(event_id) + 2 FROM base)
            UNION ALL SELECT 99000001, (SELECT MIN(ts) FROM base), NULL, NULL, NULL, NULL
        """,
    }
    for t, sql in specs.items():
        con.execute(
            f"CREATE OR REPLACE VIEW base AS "
            f"SELECT * FROM read_parquet('{BASE}/{t}.parquet')"
        )
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for f in os.listdir(BASE):
        t = f.removesuffix(".parquet")
        if f.endswith(".parquet") and t not in specs:
            os.symlink(os.path.join(BASE, f), out / f)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("dirty_sf")
    _copy_with_dirt(out)
    return str(out)


@pytest.fixture(scope="module")
def dirty_duck(dirty_dir):
    con = duck_connection(dirty_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", DIRTY_CONTRACT_QUERIES)
def test_dirty_contract_matches_oracle(spark, dirty_dir, dirty_duck, name):
    spec = QUERIES[name]
    assert spec.oracle, f"{name} has no oracle — cannot dirty-sweep"
    spdf = spec.spark_fn(spark, dirty_dir).toPandas()
    ddf = dirty_duck.execute(spec.oracle).fetchdf()
    problems = compare(name, spdf, ddf)
    assert not problems, f"{name} diverged on dirty fixtures: {problems}"


def test_embedding_outliers_fails_loud_on_ragged_vectors(spark, tmp_path):
    """q_embedding_outliers documents fail-loud on ragged/NULL vector
    dims (r5 ADVICE fix) — prove the guard actually fires."""
    con = duckdb.connect()
    con.execute(
        f"""COPY (
            SELECT * FROM read_parquet('{BASE}/embeddings.parquet')
            UNION ALL
            SELECT 9900001, embedding[1:5], label
            FROM read_parquet('{BASE}/embeddings.parquet')
            WHERE vec_id = (SELECT MIN(vec_id) FROM read_parquet('{BASE}/embeddings.parquet'))
        ) TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            os.symlink(os.path.join(BASE, f), tmp_path / f)
    with pytest.raises(Exception, match="ragged or null"):
        QUERIES["q_embedding_outliers"].spark_fn(spark, str(tmp_path)).collect()

"""Catalog sanity + fast oracle spot-checks at sf0.001.

The full oracle sweep runs via ``tools/verify_local.py`` at sf0.01 (and by
the driver per-round); here we keep a fast representative subset green in
plain pytest.
"""

from __future__ import annotations

import duckdb
import pytest

from kafka_stream_service_spark.queries import QUERIES
from kafka_stream_service_spark.tables import TABLE_NAMES, table_path

from tools.verify_local import compare

SPOT_CHECKS = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q_join_semi",
    "q_window_topk_per_group",
    "q_tumbling_window",
    "q_dedup_exact_hash",
    "q_knn_cosine_bruteforce",
    "q_text_token_stats",
    "q_codec_roundtrip",
]


def test_registry_shape():
    assert len(QUERIES) >= 60
    for name, spec in QUERIES.items():
        assert spec.name == name
        assert callable(spec.spark_fn)
        assert spec.oracle is None or "SELECT" in spec.oracle.upper()
    # the wide majority must be oracle-checked
    with_oracle = [s for s in QUERIES.values() if s.oracle is not None]
    assert len(with_oracle) >= 0.8 * len(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_items"}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


@pytest.mark.parametrize("name", SPOT_CHECKS)
def test_oracle_spot_check(spark, sf_dir, duck, name):
    spec = QUERIES[name]
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, problems

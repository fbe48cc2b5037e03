"""Query registry: name -> (spark callable, optional DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) wants two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``
as equivalent ANSI SQL for DuckDB. Queries without SQL-expressible
semantics register ``oracle=None`` and get the driver's weaker rows-only
check.

Oracle-matching rules applied throughout the catalog (SURVEY.md §7):

- every computed column is aliased identically in Spark and SQL;
- double aggregations go through exact DECIMAL arithmetic wherever the
  data permits (all money columns in the fixtures are 2-decimal), so
  results are bit-identical regardless of summation order — this matters
  because Spark and DuckDB sum partitions in different orders;
- timestamps stay UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _pin_session_confs(spark: SparkSession) -> None:
    """Oracle-critical session confs, applied defensively on every query
    call: the driver's harness owns its SparkSession and may not set
    these. UTC pins every session-tz-sensitive expression
    (unix_timestamp/unix_micros on NTZ, LTZ<->NTZ casts in the events
    loader) to the values DuckDB computes; nanosAsLong lets the events
    parquet (TIMESTAMP_NANOS) load at all.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a catalog query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = QuerySpec(name, wrapped, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 entries of
# ``queries()``. This explicit priority order packs that window with one
# flagship per operator family — LLM-data operators (dedup, similarity,
# text, multimodal, training pipeline), the codec, and the UDF tiers
# first (they had no hard driver verdicts in round 1), then one
# representative per relational/window/setop/streaming family. Everything
# not listed keeps its module registration order after these.
PRIORITY_ORDER: tuple[str, ...] = (
    # LLM-data flagships (never driver-verified in r1)
    "q_dedup_exact_hash",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_embedding_cosine",
    "q_knn_cosine_bruteforce",
    "q_cosine_pairs_blocked",
    "q_text_wordcount",
    "q_tfidf_top_terms",
    "q_text_quality_score",
    "q_multimodal_metadata",
    "q_multimodal_frame_sample",
    "q_training_corpus_pipeline",
    "q_codec_roundtrip",
    # UDF tiers (pandas scalar / grouped-map / UDTF)
    "q_udf_pandas_scalar",
    "q_grouped_map_zscore",
    "q_udtf_token_positions",
    # the one red row from r1, fixed this round
    "q_array_funcs",
    # TPC-H core + extra
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_forecast_revenue_filter",
    "q_national_market_share",
    # join family
    "q_join_left_outer",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta_range",
    "q_asof_join",
    "q_salted_skew_join",
    # aggregate family
    "q_agg_global_stats",
    "q_agg_having",
    # q_rollup / q_window_lag_lead carry r1 driver passes; their window
    # slots go to the two new never-driver-checked families
    "q_text_repetition",
    "q_pivot",
    "q_collect_list_sorted",
    # window family
    "q_window_topk_per_group",
    "q_window_running_sum",
    "q_gapfill_locf",
    "q_sort_limit_topk",
    # training-corpus assembly (new family; the two set-op slots moved
    # here — q_except_all / q_intersect_all carry r1 driver passes)
    "q_pack_sequences",
    "q_corpus_mixture",
    "q_distinct_multi",
    # streaming analogues + genuinely-streaming replays (hard rows for
    # the watermark / streaming-dedup surface)
    "q_tumbling_window",
    "q_continuous_aggregate",
    "q_session_window",
    "q_event_dedup",
    "q_time_rollup_multigrain",
    "q_stream_static_enrich",
    "q_stream_watermark_drop",
    "q_stream_dedup_replay",
    # new-format coverage (q_string_funcs already carries an r1 driver
    # pass; it yields its window slot to the avro codec)
    "q_avro_roundtrip",
)


def _ordered_specs() -> list[QuerySpec]:
    missing = [n for n in PRIORITY_ORDER if n not in QUERIES]
    if missing:
        raise ValueError(f"PRIORITY_ORDER names not registered: {missing}")
    prioritized = set(PRIORITY_ORDER)
    rest = [spec for name, spec in QUERIES.items() if name not in prioritized]
    return [QUERIES[n] for n in PRIORITY_ORDER] + rest


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark_fn for spec in _ordered_specs()}


def oracle_sql_dict() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered_specs() if spec.oracle is not None}

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
    # For rows-only queries (oracle=None): the name of the hash-verified
    # portable twin that certifies the same pipeline under portable
    # (md5-derived) hashing. Machine-readable so CORRECTNESS readers can
    # resolve a `no_oracle` row to its green certificate
    # (tests/test_coverage_doc.py enforces the invariant).
    portable_twin: str | None = None


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
    # NOTE: spark.sql.codegen.cache.maxEntries (see session.py) is a
    # STATIC conf — it cannot be pinned here on a live session; sessions
    # built outside get_spark() keep the 100-entry default (a perf,
    # never a correctness, difference).


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    portable_twin: str | None = None,
):
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
        QUERIES[name] = QuerySpec(
            name, wrapped, oracle, tags, doc or (fn.__doc__ or ""), portable_twin
        )
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 entries of
# ``queries()``. Round-14 rotation (VERDICT r13 next-steps #1 and #4),
# computed from CORRECTNESS_r*.json (tests/test_registry_window.py
# recomputes the same debt and fails on drift):
# (a) the 3 rows whose latest driver verdict is r3 — they cross the
#     10-round staleness horizon THIS round and the gate is red until
#     they are seated (q_union_missing_columns, q_unpivot_stack,
#     q_volume_shipping_nation_pairs);
# (b) 1 plan-change re-cert prescribed by the r13 judge:
#     q_knn_ivf_refresh moves from the fixed K=8 module constant to
#     delta-proportional K≈sqrt(N), so its certified plan changes and
#     the r13 verdict no longer covers the shipping plan;
# (c) 41 canaries = the ENTIRE live r4-verdict tier, alphabetical
#     (the tier's other 2 verdicts name since-retired rows,
#     q_multimodal_{decode,resize}_stub, superseded by the real
#     codec-backed rows which carry later verdicts) — after this
#     window lands, the oldest remaining verdict is r5;
# (d) 5 oldest r5-tier canaries, alphabetical, filling to exactly 50
#     (q_approx_aggregates leads them: its plan changed in r13 — the
#     distinct-rewrite Expand fix — so the re-cert is overdue anyway).
# 3 + 1 + 41 + 5 = 50 exactly. NEW_THIS_ROUND resets to () at round
# open per protocol; any r14 births are appended there and wait for
# the r15 window.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 3 rows at the staleness horizon (r3 verdicts)
    "q_union_missing_columns",
    "q_unpivot_stack",
    "q_volume_shipping_nation_pairs",
    # (b) plan-change re-cert: delta-proportional IVF K (r13 verdict #4)
    "q_knn_ivf_refresh",
    # (c) the full live r4-verdict canary tier (41 rows)
    "q03_top_orders_by_revenue",
    "q05_regional_supplier_volume",
    "q06_forecast_revenue_filter",
    "q10_returned_items",
    "q_asof_join",
    "q_bitwise_ops",
    "q_codec_dlq_split",
    "q_codec_roundtrip",
    "q_cohort_retention",
    "q_continuous_aggregate",
    "q_conversion_funnel",
    "q_cosine_pairs_blocked",
    "q_decontaminate_ngram",
    "q_dedup_clusters",
    "q_dedup_embedding_cosine",
    "q_dedup_exact_hash",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_embedding_quantize_int8",
    "q_knn_cosine_int8",
    "q_knn_ivf",
    "q_knn_lsh_buckets",
    "q_ohlc_resample",
    "q_pack_sequences",
    "q_partitioned_pruning",
    "q_salted_count_distinct",
    "q_salted_skew_join",
    "q_schema_evolution_merge",
    "q_sequence_generate",
    "q_session_window",
    "q_stateful_running_totals_replay",
    "q_stream_dedup_replay",
    "q_stream_incremental_dedup",
    "q_stream_stream_join_replay",
    "q_stream_watermark_drop",
    "q_text_quality_score",
    "q_text_unigram_logprob",
    "q_text_wordcount",
    "q_training_corpus_pipeline",
    "q_weighted_sample",
    "q_window_topk_per_group",
    # (d) 5 oldest r5-tier canaries (q_approx_aggregates also carries
    #     the r13 Expand-fix plan change)
    "q_approx_aggregates",
    "q_audio_decode",
    "q_audio_frame_energy",
    "q_audio_mixdown_decimate",
    "q_boilerplate_bigrams",
)
# Queries declared for the first time in the CURRENT round (no driver
# verdict yet, by construction — they were born after the last
# CORRECTNESS file). tests/test_registry_window.py asserts every name
# here is genuinely verdict-less and that the NEXT round's mandatory
# window (these births + rows going stale) still fits in 50 slots.
# Reset to () at each round open, after moving the previous round's
# births into PRIORITY_ORDER.
NEW_THIS_ROUND: tuple[str, ...] = ()
# r15 window plan (compute, don't trust): lead with any r14 births,
# then the 39 r5-verdict rows not seated this round (they hit the
# horizon boundary at r15 and MUST all seat), then the r14
# plan-change re-certs whose rows had no r14 seat — in r14, 21 rows
# changed plans (cpu_fanout on the Arrow codec/fixture lanes, the
# IVF delta-k + prune regime, the percentile rank replan, the
# continuous-aggregate stamp); 8 of them hold r14 seats already
# (q_audio_decode, q_audio_frame_energy, q_audio_mixdown_decimate,
# q_codec_dlq_split, q_codec_roundtrip, q_continuous_aggregate,
# q_knn_ivf, q_knn_ivf_refresh), leaving 12 for r15's 11 free slots:
# q_percentiles_exact, q_winsorized_stats, q_order_cycle_time,
# q_mad_outliers, q_qq_points, q_udf_pandas_scalar, q_avro_roundtrip,
# q_arrow_map_batches, q_multimodal_metadata, q_image_ahash,
# q_image_dhash — exactly 11 (three more plan-changed rows —
# q_multimodal_decode, q_multimodal_resize, q_image_augment — are
# ALREADY r15-mandatory: their latest verdicts are r5, so the
# mandatory tier covers their re-cert for free; the 12th,
# q_audio_zero_crossing — the smallest plan delta, exchange kind only,
# verdict r8 — goes to r16 alongside the 47-row r6 tier: 47 + 1 = 48
# <= 50, checked). 39 + 11 = 50 exactly. q_binaryfile_ingest is NOT owed a seat: only
# its fixture's write parallelism changed, its read plan and outputs
# are untouched. tests/test_registry_window.py fails if the r5 tier
# is missed.

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

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
# ``queries()``. Round-15 rotation (VERDICT r14 next-steps #1),
# computed from CORRECTNESS_r*.json (tests/test_registry_window.py
# recomputes the same debt and fails on drift):
# (a) 0 r14 births (the freeze held — NEW_THIS_ROUND was empty);
# (b) the ENTIRE 39-row r5-verdict tier not seated in r14 — these
#     rows cross the 10-round staleness horizon at r16, so r15 is
#     their last compliant seat (the look-ahead gate
#     test_next_round_debt_fits_one_window is red otherwise);
# (c) 11 plan-change re-certs from r14's 21 plan-changed rows:
#     the percentile family moved onto group_exact_percentiles
#     (q_percentiles_exact, q_winsorized_stats, q_order_cycle_time,
#     q_mad_outliers, q_qq_points), the cpu_fanout Arrow-lane rework
#     (q_udf_pandas_scalar, q_avro_roundtrip, q_arrow_map_batches,
#     q_multimodal_metadata, q_image_ahash, q_image_dhash). 8 other
#     plan-changed rows got r14 seats; q_multimodal_decode,
#     q_multimodal_resize, q_image_augment are covered by (b); the
#     12th, q_audio_zero_crossing (exchange-kind-only delta, verdict
#     r8), rides to r16 with the 47-row r6 tier (47+1 <= 50, checked).
# 39 + 11 = 50 exactly. NEW_THIS_ROUND resets to () at round open
# per protocol; any r15 births are appended there and wait for r16.
PRIORITY_ORDER: tuple[str, ...] = (
    # (b) the full unseated r5-verdict tier (39 rows, alphabetical) —
    #     must seat at r15 or rot at r16
    "q_bpe_merge_candidates",
    "q_bucketed_join",
    "q_cdc_snapshot_diff",
    "q_chunk_documents",
    "q_csv_permissive_dirty",
    "q_data_quality_report",
    "q_event_transitions",
    "q_ewma_smoothing",
    "q_groupwise_regression",
    "q_image_augment",
    "q_incremental_cagg_merge",
    "q_inverted_index",
    "q_ivf_probe_portable",
    "q_jaccard_prefix_join",
    "q_key_skew_profile",
    "q_kmeans_assign_int8",
    "q_kmeans_update_int8",
    "q_knn_lsh_buckets_portable",
    "q_length_bucketing",
    "q_multi_format_join",
    "q_multimodal_decode",
    "q_multimodal_resize",
    "q_pagerank_candidates",
    "q_partition_overwrite",
    "q_repeated_ngram_spans",
    "q_rolling_anomaly",
    "q_scd2_history",
    "q_segment_dedup_reconstruct",
    "q_simhash_portable",
    "q_split_leakage",
    "q_stream_dedup_then_window_replay",
    "q_stream_outer_join_replay",
    "q_stream_semi_join_replay",
    "q_stream_session_window_replay",
    "q_table_profile",
    "q_triangle_candidates",
    "q_upsert_merge",
    "q_vocab_coverage",
    "q_zorder_cells",
    # (c) r14 plan-change re-certs without an r14 seat (11 rows):
    #     percentile-histogram family, then cpu_fanout Arrow lanes
    "q_percentiles_exact",
    "q_winsorized_stats",
    "q_order_cycle_time",
    "q_mad_outliers",
    "q_qq_points",
    "q_udf_pandas_scalar",
    "q_avro_roundtrip",
    "q_arrow_map_batches",
    "q_multimodal_metadata",
    "q_image_ahash",
    "q_image_dhash",
)
# Queries declared for the first time in the CURRENT round (no driver
# verdict yet, by construction — they were born after the last
# CORRECTNESS file). tests/test_registry_window.py asserts every name
# here is genuinely verdict-less and that the NEXT round's mandatory
# window (these births + rows going stale) still fits in 50 slots.
# Reset to () at each round open, after moving the previous round's
# births into PRIORITY_ORDER.
NEW_THIS_ROUND: tuple[str, ...] = ()
# r16 window plan (compute, don't trust): lead with any r15 births,
# then the 47-row r6-verdict tier (it crosses the horizon at r17, so
# r16 is its last compliant seat), then q_audio_zero_crossing (r14
# plan change, exchange-kind-only delta, verdict r8, deferred from
# r15 by one-slot overflow), then the r15 plan-change re-certs:
# q_approx_aggregates (r14 verdict — its exact median moved off the
# last F.percentile buffering aggregate onto group_exact_percentiles,
# caught by the r15 source lint) and q_knn_ivf (r14 verdict — the fan
# moved inside ivf_knn: corpus lane fanned, broadcast-bound probe lane
# deliberately not). 47 + 1 + 2 = 50 exactly.
#
# r15 OPTIMIZATION-round plan changes and their re-cert seats (the
# optimization mandate touches plans catalog-wide; every change to a
# certified row is seated at the earliest window with room, riding the
# natural tier rotation where possible — the q_audio_zero_crossing
# "rides to r16" precedent):
# - rows plan-changed while IN the r15 window re-certify THIS round on
#   the new plan (no extra seat);
# - r6/r7/r8/r9-verdict rows ride their natural r16-r19 tier seats;
# - q_holt_linear_smoothing, q_holt_winters_additive,
#   q_forecast_backtest (all verdict r10, recursion -> grouped Arrow
#   scan, oracle-identical at sf0.01+sf0.1): take 3 of r17's 4 spare
#   slots (r7 tier is 46) rather than waiting for their natural r20
#   seat. r17 = 46 + 3 = 49, one slot spare.
# - q_benjamini_hochberg (verdict r11) and q_trigram_like_index
#   (verdict r10): cpu_fanout on their scan-rooted md5 lanes (one
#   round-robin exchange added, identity at production scan widths;
#   oracle-identical at sf0.01). Seated in r18's spare (r8 tier is 40):
#   r18 = 40 + 2 = 42.
# Session-config deltas (AQE coalesce minPartitionSize floor, replay
# state-provider default) change no logical/static physical plans and
# book no seats.
# tests/test_registry_window.py fails if the r6 tier is missed.

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

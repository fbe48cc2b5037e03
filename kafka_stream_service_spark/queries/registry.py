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
# ``queries()``. Round-12 rotation (VERDICT r11 next-steps #1): the
# ENTIRE window is the certification debt — no births, no re-certs of
# already-green rows. Composition:
# (a) the 18 round-11 births that never received a driver verdict
#     (the r11 window rotation ran out of slots after batch 14;
#     CORRECTNESS_r01..r11 ∌ these names),
# (b) the 3 rows whose only driver verdict dates to r1
#     (q_union_distinct, q_intersect_all, q_except_all),
# (c) the 28 rows whose latest driver verdict dates to r2, and
# (d) the rows-only sentinel q_dedup_minhash_lsh (its hash-green
#     portable twin q_minhash_lsh_portable is r11-certified).
# 18 + 3 + 28 + 1 = 50 exactly. This restores the invariant "every
# declared query has a driver verdict, none older than the rotation
# horizon" — now enforced by tests/test_registry_window.py, which
# recomputes the debt from CORRECTNESS_r*.json instead of trusting
# this comment. New r12 queries (if any) must be listed in
# NEW_THIS_ROUND below and wait for the r13 window.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 18 deferred round-11 births, in deferral order
    "q_krippendorff_alpha",
    "q_cramers_v",
    "q_mcc_filters",
    "q_odds_ratio_ci",
    "q_pacf_daily",
    "q_brown_forsythe",
    "q_granger_lag1",
    "q_stream_cusum_replay",
    "q_ljung_box",
    "q_page_hinkley",
    "q_dunns_test",
    "q_bm25_after_refresh",
    "q_conformal_coverage",
    "q_bradley_terry",
    "q_diff_in_differences",
    "q_shapley_attribution",
    "q_copeland_condorcet",
    "q_holm_bonferroni",
    # (b) the 3 r1-only canaries
    "q_union_distinct",
    "q_intersect_all",
    "q_except_all",
    # (c) the 28 r2-only canaries
    "q_agg_global_stats",
    "q_agg_having",
    "q_array_funcs",
    "q_avro_roundtrip",
    "q_collect_list_sorted",
    "q_corpus_mixture",
    "q_distinct_multi",
    "q_event_dedup",
    "q_gapfill_locf",
    "q_grouped_map_zscore",
    "q_join_cross",
    "q_join_full_outer",
    "q_join_left_outer",
    "q_join_semi",
    "q_join_theta_range",
    "q_multimodal_frame_sample",
    "q_multimodal_metadata",
    "q_national_market_share",
    "q_pivot",
    "q_sort_limit_topk",
    "q_stream_static_enrich",
    "q_text_repetition",
    "q_tfidf_top_terms",
    "q_time_rollup_multigrain",
    "q_tumbling_window",
    "q_udf_pandas_scalar",
    "q_udtf_token_positions",
    "q_window_running_sum",
    # (d) the rows-only sentinel (twin q_minhash_lsh_portable r11-green)
    "q_dedup_minhash_lsh",
)
# Queries declared for the first time in the CURRENT round (no driver
# verdict yet, by construction — they were born after the last
# CORRECTNESS file). tests/test_registry_window.py asserts every name
# here is genuinely verdict-less and that the NEXT round's mandatory
# window (these births + rows going stale) still fits in 50 slots.
# Reset to () at each round open, after moving the previous round's
# births into PRIORITY_ORDER.
NEW_THIS_ROUND: tuple[str, ...] = (
    # round-12 births (queries/round12.py): the r12 window is fully
    # spent on the 49-row certification debt, so these take their
    # driver verdicts in the r13 window (judge full-catalog sweep +
    # tools/verify_local.py cover them meanwhile).
    "q_snapshot_gc_census",
    "q_knn_ivf_refresh",
)
# r13 window plan (compute, don't trust): lead with NEW_THIS_ROUND's 2
# births, then the 5 round-12 CHANGED rows as re-certs (the rank
# migration: q_systematic_sample, q_decile_lift, q_calibration_bins,
# q_cume_dist_percentiles, q_histogram_equidepth — outputs hash-proven
# unchanged, but the driver verdict should cover the shipping plan),
# then the oldest canaries by latest-verdict round (r3 first; 47 rows
# carry r3-only verdicts) up to the 50 slots, and reset NEW_THIS_ROUND
# to (). tests/test_registry_window.py fails if any of this is missed.


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

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
# ``queries()``. Round-13 rotation (VERDICT r12 next-steps #1),
# computed from CORRECTNESS_r*.json (tests/test_registry_window.py
# recomputes the same debt and fails on drift):
# (a) the 2 round-12 births, verdict-less by construction
#     (q_snapshot_gc_census, q_knn_ivf_refresh — judge-green in the
#     r12 full-catalog sweep, queued first exactly as prescribed),
# (b) the 5 rows migrated onto the two-phase rank operator in r12
#     (outputs hash-proven unchanged, but their latest driver
#     verdicts — r3..r7 — predate the shipping plan; re-certify),
# (c) 43 of the 47 rows whose latest driver verdict dates to r3,
#     alphabetical (one of the 47, q_cume_dist_percentiles, already
#     holds a re-cert seat in (b)); the remaining 3
#     (q_union_missing_columns, q_unpivot_stack,
#     q_volume_shipping_nation_pairs) cross the horizon in r14 and
#     lead that window.
# 2 + 5 + 43 = 50 exactly. NEW_THIS_ROUND resets to () at round
# open per protocol; any r13 births are appended there and wait for
# the r14 window.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 2 round-12 births
    "q_snapshot_gc_census",
    "q_knn_ivf_refresh",
    # (b) the 5 rank-migration re-certs (r12 plan change)
    "q_systematic_sample",
    "q_decile_lift",
    "q_calibration_bins",
    "q_cume_dist_percentiles",
    "q_histogram_equidepth",
    # (c) 43 oldest canaries (latest driver verdict = r3)
    "q_array_algebra",
    "q_binary_encodings",
    "q_corr_covar",
    "q_correlated_exists",
    "q_csv_roundtrip",
    "q_customer_order_distribution",
    "q_disjunctive_predicates",
    "q_embedding_stats_by_label",
    "q_excess_quantity_suppliers",
    "q_explode_variants",
    "q_from_json_struct",
    "q_gapfill_interpolate",
    "q_global_sales_opportunity",
    "q_hash_functions",
    "q_hash_sample",
    "q_important_part_value",
    "q_interval_arithmetic",
    "q_join_anti",
    "q_json_roundtrip",
    "q_lang_source_profile",
    "q_large_volume_customers",
    "q_levenshtein_similarity",
    "q_map_algebra",
    "q_min_balance_supplier_per_region",
    "q_orc_roundtrip",
    "q_percentiles_exact",
    "q_product_profit_by_nation_year",
    "q_promo_revenue_ratio",
    "q_regexp_extract_all",
    "q_rollup_grouping_id",
    "q_scalar_subquery",
    "q_shipmode_buckets",
    "q_small_quantity_revenue",
    "q_sole_failed_supplier",
    "q_stratified_sample",
    "q_supplier_cnt_by_part_attrs",
    "q_text_bigrams",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_redact_pii",
    "q_text_repetition_charcov",
    "q_text_token_stats",
    "q_top_supplier_by_revenue",
)
# Queries declared for the first time in the CURRENT round (no driver
# verdict yet, by construction — they were born after the last
# CORRECTNESS file). tests/test_registry_window.py asserts every name
# here is genuinely verdict-less and that the NEXT round's mandatory
# window (these births + rows going stale) still fits in 50 slots.
# Reset to () at each round open, after moving the previous round's
# births into PRIORITY_ORDER.
NEW_THIS_ROUND: tuple[str, ...] = ()
# r14 window plan (compute, don't trust): lead with any r13 births,
# then the 3 r3-verdict rows left out of this window
# (q_union_missing_columns, q_unpivot_stack,
# q_volume_shipping_nation_pairs), then the oldest remaining canaries
# (r4 tier) up to 50 slots. tests/test_registry_window.py fails if
# this is missed.

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

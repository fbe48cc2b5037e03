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
# ``queries()``. Round-9 rotation (VERDICT r8 next-steps #1):
# (a) the 21 never-driver-sampled round-8 queries lead the window —
# computed as union(CORRECTNESS_r01..r08 keys) vs the 355-name registry
# (matches the r8 tail comment exactly). All 21 are judge-green in the
# r8 full-catalog sweep; once CORRECTNESS_r09 lands green, EVERY catalog
# query has earned a driver verdict at least once.
# (b) queries round 9 ADDS are inserted after them as they land (new
# operators get driver verdicts in their birth round) up to the 50-slot
# budget.
# (c) q_dedup_minhash_lsh stays as the rows-only sentinel and
# q01_pricing_summary as the flagship drift canary.
# Everything displaced past slot 50 carries a green driver verdict from
# r1-r8 plus the judge's full-catalog gate.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 21 never-driver-sampled round-8 queries (computed set)
    "q_kendall_tau",
    "q_spearman_rho",
    "q_anova_oneway",
    "q_seasonal_decompose",
    "q_ann_rerank_two_stage",
    "q_psi_drift",
    "q_ece_calibration",
    "q_woe_binning",
    "q_decision_tree_score",
    "q_clustering_coefficient",
    "q_bpe_apply_merges",
    "q_skipgram_negative_sampling",
    "q_temperature_mixing",
    "q_dedup_incremental_fast",
    "q_preference_pairs",
    "q_tokenizer_fertility",
    "q_bleu_ngram_precision",
    "q_hll_set_algebra",
    "q_forecast_backtest",
    "q_span_corruption_masking",
    "q_dataset_shard_manifest",
    # (b) the 19 round-9-new queries (driver verdicts in their birth
    # round), followed by 8 re-cert slots (round-8-new queries with a
    # single driver verdict each) filling the window to exactly 50.
    "q_ccnet_perplexity_buckets",
    "q_gopher_quality_rules",
    "q_dsir_importance_weights",
    "q_chrf_pair_fscore",
    "q_runs_test_daily",
    "q_stream_quality_gate_replay",
    "q_stream_sliding_window_replay",
    "q_welch_ttest",
    "q_hits_two_iterations",
    "q_bpe_train_iterations",
    "q_curation_mixture",
    "q_permutation_test_hashed",
    "q_holt_winters_additive",
    "q_sql_session_variables",
    "q_quantile_normalization",
    "q_ols_normal_equations",
    "q_hash_uniformity_audit",
    "q_trigram_like_index",
    "q_table_fingerprint",
    "q_kaplan_meier",
    "q_cusum_changepoint",
    "q_holt_linear_smoothing",
    "q_isotonic_calibration",
    "q_cuped_adjustment",
    "q_label_propagation",
    "q_logreg_score_text",
    "q_basket_triples_apriori",
    # (c) sentinel + flagship drift canary (oldest green verdicts)
    "q_dedup_minhash_lsh",
    "q01_pricing_summary",
)
# After the r9 rotation every r1-r8 query carries a driver-green verdict
# from its birth or rotation round; only round-9 additions past the
# 50-slot budget (none yet) would need an r10 rotation. The computed
# check stays authoritative:
# union(CORRECTNESS_r01..r09 keys) vs the registry.


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

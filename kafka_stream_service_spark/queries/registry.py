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
    # NOTE: spark.sql.codegen.cache.maxEntries (see session.py) is a
    # STATIC conf — it cannot be pinned here on a live session; sessions
    # built outside get_spark() keep the 100-entry default (a perf,
    # never a correctness, difference).


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
# ``queries()``. Round-5 rotation: after r4 every oracled query in the
# catalog carries a green driver verdict, so the window packs
# (a) everything round 5 added or materially changed (none of which has
# a driver verdict yet): the early-round operators (chunking,
# boilerplate, segment dedup, timeseries, triangles, sessionization,
# CDC trio), the audio codec lane, the real PNG decode/resize that
# replaced the last stubs, the portable-hash twins, and the mid-round
# additions (quality_ops batches, regression, semi-join replay, exact
# prefix Jaccard);
# (b) q_dedup_minhash_lsh as the remaining rows-only sentinel (the
# other rows-only ops rotated out — each has a hash-verified portable
# twin IN the window and 3-4 rounds of observed row counts);
# (c) flagship + family drift coverage for the remaining slots.
# Late-round additions that missed the 50 slots (text roundtrip, drift
# KL, winsorize, mode, forward as-of, idempotent merge, GDPR cascade)
# lead the r6 rotation.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) new or changed in round 5
    "q_chunk_documents",
    "q_boilerplate_bigrams",
    "q_segment_dedup_reconstruct",
    "q_rolling_anomaly",
    "q_ewma_smoothing",
    "q_triangle_candidates",
    "q_stream_session_window_replay",
    "q_audio_decode",
    "q_audio_frame_energy",
    "q_audio_mixdown_decimate",
    "q_multimodal_decode",
    "q_multimodal_resize",
    "q_image_augment",
    "q_approx_aggregates",
    "q_inverted_index",
    "q_stream_outer_join_replay",
    # (b) rows-only by design (hash-seeded / approximate) + their new
    # portable-hash twins, which carry full hash verdicts for the same
    # pipeline shapes (queries/dedup2.py)
    "q_minhash_lsh_portable",
    "q_dedup_clusters_portable",
    "q_simhash_portable",
    "q_knn_lsh_buckets_portable",
    "q_ivf_probe_portable",
    # (q_dedup_simhash / q_knn_lsh_buckets rotated out mid-round: their
    # portable twins above carry hash verdicts for the same pipeline
    # shapes, and their row counts were driver-observed r1-r4)
    "q_dedup_minhash_lsh",
    # (q_dedup_clusters rotated out late round-5 for the new
    # q_stream_semi_join_replay: clusters' rows were driver-observed
    # r2-r4 and its fixpoint carries a hash verdict via
    # q_dedup_clusters_portable; minhash stays as the rows-only sentinel)
    "q_stream_semi_join_replay",
    # (q_knn_ivf rotated out late round-5 for q_groupwise_regression:
    # its probe step carries a hash verdict via q_ivf_probe_portable
    # and its rows were driver-observed r3/r4)
    # quality_ops batch 2 (added mid-round-5)
    "q_embedding_outliers",
    "q_length_bucketing",
    "q_vocab_coverage",
    "q_groupwise_regression",
    # (c) flagship + family drift coverage
    "q_bucketed_join",
    "q_table_profile",
    "q_multi_format_join",
    "q_zorder_cells",
    "q_histogram_equidepth",
    # (q_hard_negatives rotated out late round-5 for the new exact
    # prefix-filtered Jaccard join; hard_negatives carries a green r4
    # verdict and stays pytest/bench-covered)
    "q_jaccard_prefix_join",
    "q_pagerank_candidates",
    "q_kmeans_assign_int8",
    "q_kmeans_update_int8",
    # quality_ops batch (added mid-round-5; displaced seven (c) drift
    # entries that already carry green r4 verdicts — q_text_unigram_logprob,
    # q_decontaminate_ngram, q_training_corpus_pipeline, q_pack_sequences,
    # q_stream_incremental_dedup, q_stateful_running_totals_replay,
    # q_salted_count_distinct)
    "q_data_quality_report",
    "q_referential_integrity",
    "q_bpe_merge_candidates",
    "q_repeated_ngram_spans",
    "q_key_skew_profile",
    "q_event_transitions",
    "q_incremental_cagg_merge",
    "q_stream_dedup_then_window_replay",
    "q_split_leakage",
    "q_upsert_merge",
    "q_scd2_history",
    "q_cdc_snapshot_diff",
    "q_csv_permissive_dirty",
    "q_partition_overwrite",
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

"""Structural invariants for round-6 relational/temporal operators —
properties the driver's oracle-equality check cannot state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_sweepline_conserves_mass(spark):
    """Every interval that opens must close: the running count and the
    running value both return to exactly zero after the last event day,
    and the count never dips negative anywhere in between."""
    out = QUERIES["q_interval_sweepline"].spark_fn(spark, SF)
    rows = out.orderBy("d").collect()
    assert rows[-1].in_flight == 0
    assert abs(rows[-1].value_in_flight) < 1e-9  # decimal-exact zero
    assert min(r.in_flight for r in rows) >= 0


def test_pit_join_exactly_one_version_per_fact(spark):
    """Half-open [from, to) versioning: the PIT join must emit exactly
    one row per order — equal to the plain FK join row count."""
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_scd2_point_in_time_join"].spark_fn(spark, SF)
    t = tables(spark, SF)
    plain = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    assert out.count() == plain.count()
    # and no fact row matched two versions
    dup = out.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_source_quota_caps_and_keeps_small_sources_whole(spark):
    out = QUERIES["q_source_quota"].spark_fn(spark, SF).collect()
    for r in out:
        assert r.n_kept <= 15
        assert r.n_kept == min(r.n_docs, 15)


def test_event_paths_are_valid_trigrams(spark):
    out = QUERIES["q_event_paths_topk"].spark_fn(spark, SF).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert len(r.path.split(">")) == 3
        assert r.n_users <= r.n_occurrences
    # descending by occurrences with deterministic ties
    occ = [r.n_occurrences for r in out]
    assert occ == sorted(occ, reverse=True)


def test_cogroup_lag_matches_sql_window_equivalent(spark):
    """The cogrouped pandas as-of must agree with the pure-Catalyst
    formulation (union-tag + last() window carry) — the same
    cross-implementation check the as-of join operator family uses."""
    from pyspark.sql import Window as W

    from kafka_stream_service_spark.tables import tables

    out = {
        r.user_id: (r.n_purchases, r.n_matched, r.total_lag_us)
        for r in QUERIES["q_cogroup_conversion_lag"].spark_fn(spark, SF).collect()
    }
    ev = tables(spark, SF)["events"].select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_type",
    )
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "t", (F.col("event_type") == "click").alias("is_click")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", F.col("is_click").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_click", F.last(F.when(F.col("is_click"), F.col("t")), True).over(w)
    ).filter(~F.col("is_click"))
    expect = {
        r.user_id: (r.n_purchases, r.n_matched, r.total_lag_us)
        for r in carried.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.count("last_click").cast("long").alias("n_matched"),
            F.coalesce(F.sum(F.col("t") - F.col("last_click")), F.lit(0))
            .cast("long")
            .alias("total_lag_us"),
        )
        .collect()
    }
    assert out == expect

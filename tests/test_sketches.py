"""Structural invariants of the portable sketch queries (sketches.py,
clustering.py PQ pair) that the driver's value-hash cannot express as
*properties* — it proves equality with the oracle, these prove the
sketch contracts themselves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates(spark):
    """The Count-Min guarantee: estimate >= exact for every candidate."""
    out = QUERIES["q_countmin_heavy_hitters_portable"].spark_fn(spark, SF)
    bad = out.filter(F.col("cms_estimate") < F.col("exact_count")).count()
    assert bad == 0
    assert out.count() == 30


def test_bloom_no_false_negatives(spark):
    """Every true member must hit: n_hits >= n_members, and the
    false-positive accounting must reconcile exactly."""
    row = QUERIES["q_bloom_filter_audit_portable"].spark_fn(spark, SF).collect()[0]
    assert row.n_hits >= row.n_members
    assert row.n_hits - row.n_false_positives == row.n_members
    assert 0 < row.n_bits_set <= 4096


def test_hll_register_bounds(spark):
    """Registers are 8-bit addressed, rho in [1, 53], and the register
    population count reconciles with the per-register true counts."""
    out = QUERIES["q_hll_registers_portable"].spark_fn(spark, SF)
    rows = out.collect()
    assert all(0 <= r.bucket < 256 for r in rows)
    assert all(1 <= r.max_rho <= 53 for r in rows)
    # harmonic HLL estimate from the verified registers lands within
    # 3 sigma (1.04/sqrt(m)) of the true vocabulary cardinality
    m = 256
    true_n = sum(r.n_vals for r in rows)
    reg = {r.bucket: r.max_rho for r in rows}
    s = sum(2.0 ** -reg.get(b, 0) for b in range(m))
    est = (0.7213 / (1 + 1.079 / m)) * m * m / s
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros:  # linear-counting regime correction
        import math

        est = m * math.log(m / zeros)
    assert abs(est - true_n) / true_n < 3 * 1.04 / (m ** 0.5)


def test_pq_code_shape_and_seed_vectors_have_zero_error(spark):
    """Every vector gets exactly 8 codes in [0,16); the 16 codebook seed
    vectors quantize to themselves (qerr == 0, code m == own id)."""
    out = QUERIES["q_pq_encode_portable"].spark_fn(spark, SF)
    rows = out.collect()
    for r in rows:
        parts = r.codes.split("-")
        assert len(parts) == 8
        assert all(0 <= int(p) < 16 for p in parts)
    seeds = [r for r in rows if r.vec_id < 16]
    assert len(seeds) == 16
    assert all(r.qerr == 0 for r in seeds)
    assert all(r.codes == "-".join([str(r.vec_id)] * 8) for r in seeds)


def test_pq_adc_matches_exact_on_seed_queries(spark):
    """ADC distance of a database vector that IS a codeword combination
    equals the exact lookup sum; ranks are 1..5 per query with
    monotonically non-decreasing distances."""
    out = QUERIES["q_pq_adc_topk_portable"].spark_fn(spark, SF).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {5}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)

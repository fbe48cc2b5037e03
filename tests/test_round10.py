"""Round-10 operators: ExactSubstr span semantics on planted fixtures.

The oracle gate certifies the manifest against DuckDB at sf0.01; these
tests pin the SEMANTICS on constructed corpora where the right answer is
known by hand: span merging of overlapping duplicated shingles, span
splitting across a wide-enough unique gap, and exclusion of unique /
too-short documents.
"""

from __future__ import annotations

from kafka_stream_service_spark.queries import QUERIES
from kafka_stream_service_spark.queries.round10 import K_SPAN


def _docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_exact_substr_merges_overlapping_shingles(spark, tmp_path):
    """Docs 1 and 2 share a 9-token span = two overlapping duplicated
    8-shingles, which must merge into ONE manifest span; the unique
    tails contribute nothing; unique doc 3 and sub-shingle doc 4 emit
    no rows."""
    shared = " ".join(f"w{i}" for i in range(1, 10))  # 9 tokens
    rows = [
        (1, shared + " u1 u2", "en", "s"),
        (2, "p1 " + shared, "en", "s"),
        (3, " ".join(f"q{i}" for i in range(10)), "en", "s"),
        (4, "too short", "en", "s"),
    ]
    _docs(spark, tmp_path, rows)
    out = QUERIES["q_exact_substr_spans"].spark_fn(spark, str(tmp_path)).collect()
    by_doc = {r.doc_id: r for r in out}
    assert set(by_doc) == {1, 2}
    assert (by_doc[1].span_start, by_doc[1].span_end) == (1, 9)
    assert (by_doc[2].span_start, by_doc[2].span_end) == (2, 10)
    for d in (1, 2):
        assert by_doc[d].n_shingles == 2
        assert by_doc[d].n_tokens == 9


def test_exact_substr_splits_across_unique_gap(spark, tmp_path):
    """Two shared 8-token spans separated by an 8-token unique gap must
    emit TWO manifest rows per doc (gap >= k breaks the island)."""
    a = " ".join(f"a{i}" for i in range(K_SPAN))
    b = " ".join(f"b{i}" for i in range(K_SPAN))
    gap5 = " ".join(f"g5_{i}" for i in range(K_SPAN))
    gap6 = " ".join(f"g6_{i}" for i in range(K_SPAN))
    rows = [
        (5, f"{a} {gap5} {b}", "en", "s"),
        (6, f"{a} {gap6} {b}", "en", "s"),
    ]
    _docs(spark, tmp_path, rows)
    out = QUERIES["q_exact_substr_spans"].spark_fn(spark, str(tmp_path)).collect()
    spans = sorted((r.doc_id, r.span_start, r.span_end) for r in out)
    assert spans == [
        (5, 1, K_SPAN),
        (5, 2 * K_SPAN + 1, 3 * K_SPAN),
        (6, 1, K_SPAN),
        (6, 2 * K_SPAN + 1, 3 * K_SPAN),
    ]


def test_exact_substr_stats_rolls_up_the_manifest(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(1, 10))  # 9 tokens
    rows = [
        (1, shared + " u1 u2", "en", "sA"),  # 11 toks, 9 duplicated
        (2, "p1 " + shared, "en", "sA"),  # 10 toks, 9 duplicated
        (3, " ".join(f"q{i}" for i in range(10)), "en", "sB"),  # clean
    ]
    _docs(spark, tmp_path, rows)
    out = QUERIES["q_exact_substr_stats"].spark_fn(spark, str(tmp_path)).collect()
    by_src = {r.source: r for r in out}
    assert by_src["sA"].n_docs == 2
    assert by_src["sA"].docs_with_dups == 2
    assert by_src["sA"].n_spans == 2
    assert by_src["sA"].dup_tokens == 18
    assert by_src["sA"].total_tokens == 21
    assert by_src["sA"].dup_frac_q6 == 18 * 1000000 // 21
    assert by_src["sB"].docs_with_dups == 0
    assert by_src["sB"].dup_frac_q6 == 0


def test_semdedup_keeps_exactly_one_per_group(spark):
    """Structural invariants of the SemDeDup verdict at sf0.01: every
    vector appears once, every group keeps EXACTLY one member, dup
    groups exist (fixture has similar-embedding pairs at cos >= 0.40),
    and the kept member has the group-minimal (cos_cent_q6, vec_id)."""
    rows = QUERIES["q_semdedup_prune"].spark_fn(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == len({r.vec_id for r in rows}) == 500
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append(r)
    assert all(sum(m.keep for m in ms) == 1 for ms in by_grp.values())
    multi = [ms for ms in by_grp.values() if len(ms) > 1]
    assert multi, "fixture must yield non-trivial duplicate groups"
    for ms in multi:
        assert len(ms) == ms[0].n_group
        kept = next(m for m in ms if m.keep == 1)
        assert (kept.cos_cent_q6, kept.vec_id) == min(
            (m.cos_cent_q6, m.vec_id) for m in ms
        )


def test_semdedup_stats_matches_verdict_rollup(spark):
    """The census must equal a hand rollup of the verdict frame (shared
    plan body — this pins the reuse contract)."""
    v = QUERIES["q_semdedup_prune"].spark_fn(spark, "/root/testdata/sf0.01").collect()
    s = QUERIES["q_semdedup_stats"].spark_fn(spark, "/root/testdata/sf0.01").collect()
    agg = {}
    for r in v:
        a = agg.setdefault(r.centroid_id, {"n": 0, "grps": set(), "dup": 0, "drop": 0})
        a["n"] += 1
        a["grps"].add(r.grp)
        a["dup"] += 1 if r.n_group > 1 else 0
        a["drop"] += 1 - r.keep
    for row in s:
        a = agg[row.centroid_id]
        assert (row.n_vectors, row.n_groups, row.dup_members, row.n_dropped) == (
            a["n"], len(a["grps"]), a["dup"], a["drop"]
        )
        assert row.drop_frac_q6 == a["drop"] * 1000000 // a["n"]


def test_pair_index_delta_is_subset_of_full_pairs(spark):
    """Every delta pair must appear in the full verified-pair set with
    identical Jaccard counts, and every full pair with a delta endpoint
    must be found by the incremental probe (completeness both ways)."""
    from kafka_stream_service_spark.queries.dedup2 import _verified_pairs

    sf = "/root/testdata/sf0.01"
    _, full = _verified_pairs(spark, sf)
    full_rows = {(r.id_a, r.id_b): (r.n_inter, r.n_union) for r in full.collect()}
    delta_rows = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in QUERIES["q_pair_index_delta"].spark_fn(spark, sf).collect()
    }
    assert delta_rows, "fixture must yield delta-endpoint pairs"
    for k, v in delta_rows.items():
        assert full_rows.get(k) == v
    expected = {
        k for k in full_rows if k[0] % 10 == 7 or k[1] % 10 == 7
    }
    assert set(delta_rows) == expected


def test_power_iteration_matches_numpy(spark):
    """v1/v2 and the Rayleigh estimate must agree with a dense numpy
    recomputation from the same quantized vectors (the OLS-vs-lstsq
    cross-check pattern)."""
    import numpy as np

    from kafka_stream_service_spark.queries.corpus_ops import _quantized
    from kafka_stream_service_spark.tables import tables

    sf = "/root/testdata/sf0.01"
    q = _quantized(tables(spark, sf)["embeddings"]).select("qv").collect()
    X = np.array([r.qv for r in q], dtype=object)[:, :8].astype(np.int64)
    n = X.shape[0]
    C = n * (X.T @ X) - np.outer(X.sum(axis=0), X.sum(axis=0))
    ones = np.ones(8, dtype=object)
    v1 = (C.astype(object) @ ones)
    v2 = (C.astype(object) @ v1)
    lam = int(np.floor(100.0 * (float(sum(a * b for a, b in zip(v1, v2)))
                                / float(sum(a * a for a in v1)))))
    rows = QUERIES["q_power_iteration_top_eigvec"].spark_fn(spark, sf).collect()
    assert len(rows) == 8
    for r in rows:
        assert int(r.v1_str) == int(v1[r.dim - 1])
        assert int(r.v2_str) == int(v2[r.dim - 1])
        assert r.lambda_q2 == lam


def test_weighted_sample_prefers_heavy_docs(spark):
    """E-S keys bias selection toward large weights: the mean n_chars of
    sampled docs must exceed the corpus mean (w range is wide enough at
    sf0.01 that this holds deterministically for the fixed hash)."""
    from kafka_stream_service_spark.tables import tables

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["q_weighted_sample_es"].spark_fn(spark, sf).collect()
    assert all(1 <= r.rnk <= 5 for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    assert all(len(v) == 5 for v in per_src.values())
    d = tables(spark, sf)["documents"].collect()
    mean_all = sum(x.n_chars for x in d) / len(d)
    mean_sample = sum(r.w for r in rows) / len(rows)
    assert mean_sample > mean_all


def test_cliffs_delta_invariants(spark):
    r = QUERIES["q_cliffs_delta"].spark_fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.two_u1 + r.two_u2 == 2 * r.n1 * r.n2  # 2U conservation
    assert -1_000_000 <= r.cliffs_delta_q6 <= 1_000_000
    # delta must match the U identity exactly
    import math
    assert r.cliffs_delta_q6 == math.floor(
        1e6 * (r.two_u1 - r.two_u2) / (2.0 * r.n1 * r.n2)
    )


def test_heaps_points_monotone_and_sublinear(spark):
    rows = sorted(
        QUERIES["q_heaps_law_fit"].spark_fn(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.f,
    )
    assert [r.f for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens > a.n_tokens
        assert b.v_words >= a.v_words
    # 31-word vocab saturates instantly -> strongly sublinear growth
    betas = {r.beta_q6 for r in rows}
    assert len(betas) == 1
    assert 0 <= betas.pop() < 1_000_000


def test_matryoshka_energy_monotone_in_prefix(spark):
    rows = QUERIES["q_matryoshka_energy"].spark_fn(spark, "/root/testdata/sf0.01").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, {})[r.d] = r.avg_cos_q6
    for label, d in by_label.items():
        assert set(d) == {8, 16, 32, 64}
        assert d[8] <= d[16] <= d[32] <= d[64]
        assert d[64] == 1_000_000  # the full prefix IS the vector


def test_survival_tier_consistency(spark):
    """Nelson-Aalen cumulative hazard must be nonnegative, nondecreasing,
    and >= the KM -ln(S) at every duration (the classic H_NA <= -ln(S_KM)
    inequality is reversed for these estimators: -ln(1-x) >= x, so KM's
    -ln S >= NA's H; with per-term floor quantization allow len ulps)."""
    na = sorted(
        QUERIES["q_nelson_aalen"].spark_fn(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.t_days,
    )
    km = {
        r.t_days: r.ln_surv_q6
        for r in QUERIES["q_kaplan_meier"].spark_fn(spark, "/root/testdata/sf0.001").collect()
    }
    prev = 0
    comparable = True
    for i, r in enumerate(na):
        assert r.cumhaz_q6 >= prev
        prev = r.cumhaz_q6
        if r.n_risk == r.n_events:
            # risk set dies: KM's ln(0) term is NULL and its running sum
            # stops accumulating, so the inequality no longer applies
            comparable = False
        if comparable and km.get(r.t_days) is not None:
            # -ln S_KM >= H_NA, up to one quantization ulp per term
            assert -km[r.t_days] >= r.cumhaz_q6 - (i + 1)


def test_logrank_and_brier_sane(spark):
    lr = QUERIES["q_logrank_test"].spark_fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert lr.o1 > 0 and lr.v_sum_q9 > 0
    # priority is assigned independently of returnflag in the fixture ->
    # no real effect; z should be small (|z| < 5)
    assert abs(lr.z_q6) < 5_000_000
    br = QUERIES["q_brier_decomposition"].spark_fn(spark, "/root/testdata/sf0.01").collect()
    uncs = {r.unc_q9 for r in br}
    assert len(uncs) == 1
    for r in br:
        assert r.rel_term_q9 >= 0 and r.res_term_q9 >= 0


def test_stream_reservoir_final_state_equals_batch_sample(spark):
    """The streaming reservoir's FULL-corpus emission must be
    row-identical to the batch q_weighted_sample_es — the batch==stream
    equality contract for the sampling tier."""
    sf = "/root/testdata/sf0.01"
    batch = {
        (r.source, r.doc_id, r.w, r.key_q9, r.rnk)
        for r in QUERIES["q_weighted_sample_es"].spark_fn(spark, sf).collect()
    }
    stream_rows = QUERIES["q_stream_weighted_sample_replay"].spark_fn(spark, sf).collect()
    assert batch <= {
        (r.source, r.doc_id, r.w, r.key_q9, r.rnk) for r in stream_rows
    }, "every batch top-k row must appear in the stream's merged emission"

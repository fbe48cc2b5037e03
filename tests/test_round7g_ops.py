"""Structural invariants for round-7g: modularity, mutual information,
LOO target encoding, int8 covariance, RAKE, SELECT * EXCEPT."""

from __future__ import annotations

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_modularity_censuses_are_conserved(spark):
    """Degree sums over communities partition 2m; intra edges never
    exceed m; every contribution is < 1 (x1e9)."""
    out = QUERIES["q_modularity_by_source"].spark_fn(spark, SF).collect()
    assert out
    m = out[0].m
    assert all(r.m == m for r in out)
    assert sum(r.d_c for r in out) == 2 * m
    assert sum(r.e_c for r in out) <= m
    for r in out:
        assert r.q_contrib_1e9 < 1_000_000_000


def test_mutual_information_cells_partition_and_bound(spark):
    """Cells partition the corpus; the quantized MI total respects the
    floor-error lower bound sum >= 1e6*N*MI - N >= -N (true MI >= 0)."""
    out = QUERIES["q_mutual_information"].spark_fn(spark, SF).collect()
    n = sum(r.n_xy for r in out)
    assert n > 0
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang.setdefault(r.lang, r.n_x)
        assert by_lang[r.lang] == r.n_x
    assert sum(by_lang.values()) == n
    assert sum(r.mi_contrib_q for r in out) >= -n


def test_loo_encoding_reconstructs_category_sum(spark):
    """Identity: sum_i (S - y_i)/(n-1) == S exactly — the quantized
    per-row encodings weighted by multiplicity reconstruct S*1e6 within
    total floor error (< n rows)."""
    out = QUERIES["q_target_encoding_loo"].spark_fn(spark, SF).collect()
    by_cat: dict[str, list] = {}
    for r in out:
        by_cat.setdefault(r.o_orderpriority, []).append(r)
    for cat, rows in by_cat.items():
        n = sum(r.n_rows for r in rows)
        s = sum(r.n_rows * r.y for r in rows)
        approx = sum(r.n_rows * r.loo_enc_q for r in rows)
        assert s * 1_000_000 - n <= approx <= s * 1_000_000


def test_covariance_diagonal_nonnegative_and_complete(spark):
    out = QUERIES["q_embedding_covariance_int8"].spark_fn(spark, SF).collect()
    assert len(out) == 36  # 8 choose 2 + 8 diagonal
    n = out[0].n
    for r in out:
        assert r.n == n
        assert 1 <= r.dim_i <= r.dim_j <= 8
        if r.dim_i == r.dim_j:
            assert r.cov_num >= 0  # n*Sxx - Sx^2 >= 0 always


def test_rake_phrases_are_stopword_free(spark):
    out = QUERIES["q_rake_keywords"].spark_fn(spark, SF).collect()
    assert len(out) == 20
    for r in out:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= 4
        assert all(w not in ("the", "a") and w != "" for w in words)
        assert r.score_q > 0
        assert r.n_occur >= 1


def test_select_except_schema(spark):
    df = QUERIES["q_select_except"].spark_fn(spark, SF)
    assert df.columns == [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        "l_linestatus",
    ]

"""Property tests for the round-8 operator batches (round8*.py).

The driver/oracle gate already hash-verifies exact values at sf0.01;
these tests pin the ALGEBRAIC contracts that a hash can't explain when
it breaks: monotonicity of the isotonic fit, survival-curve shape,
CUSUM telescoping to zero, Apriori antimonotonicity, silhouette range,
decomposition reconstruction, and the two-stage retriever's ordering
invariants.
"""

from __future__ import annotations

import pytest

from kafka_stream_service_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def run(name, spark):
    return QUERIES[name].spark_fn(spark, SF).toPandas()


def test_kaplan_meier_curve_shape(spark):
    df = run("q_kaplan_meier", spark).sort_values("t_days").reset_index(drop=True)
    # risk set starts at the full population and never grows
    assert (df["n_risk"].diff().dropna() <= 0).all()
    assert df["n_risk"].iloc[0] == df["n_events"].sum() + df["n_censored"].sum()
    # log-survival is non-increasing where defined
    ls = df["ln_surv_q6"].dropna()
    assert (ls.diff().dropna() <= 0).all()
    assert (ls <= 0).all()


def test_cusum_telescopes_to_zero_and_flags_peak(spark):
    df = run("q_cusum_changepoint", spark).sort_values("day_idx")
    # C_N * N = N*T - N*T = 0: the deviations telescope away
    assert df["cusum_scaled"].iloc[-1] == 0
    assert df["is_peak"].sum() >= 1
    peak_abs = df.loc[df["is_peak"] == 1, "cusum_scaled"].abs().unique()
    assert (df["cusum_scaled"].abs() <= peak_abs.max()).all()


def test_holt_anchors_and_forecast_identity(spark):
    df = run("q_holt_linear_smoothing", spark).sort_values("day_ix")
    r0 = df.iloc[0]
    # anchor: level = x, trend = 0, forecast = level
    assert r0["level_q6"] == r0["x_cents"] * 1_000_000
    assert r0["trend_q6"] == 0
    assert r0["forecast_next_q6"] == r0["level_q6"]
    assert len(df) == 30


def test_isotonic_fit_is_monotone(spark):
    df = run("q_isotonic_calibration", spark).sort_values("bin")
    assert (df["iso_q6"].diff().dropna() >= 0).all()
    # the fit stays inside the observed rate range
    assert df["iso_q6"].max() <= df["rate_q6"].max()
    assert df["iso_q6"].min() >= df["rate_q6"].min()


def test_cuped_is_a_consistent_two_arm_readout(spark):
    df = run("q_cuped_adjustment", spark)
    assert sorted(df["arm"]) == [0, 1]
    assert df["theta_q6"].nunique() == 1  # pooled theta
    assert (df["var_y_q6"] >= 0).all() and (df["var_y_adj_q6"] >= 0).all()
    # CUPED reduces pooled variance; allow per-arm slack of 5%
    assert (df["var_y_adj_q6"] <= 1.05 * df["var_y_q6"]).all()


def test_label_propagation_partitions_the_vertices(spark):
    from pyspark.sql import functions as F

    from kafka_stream_service_spark.queries.graph_q import _candidate_edges

    df = run("q_label_propagation", spark)
    edges = _candidate_edges(spark, SF)
    n_vertices = (
        edges.select(F.col("u").alias("v"))
        .unionAll(edges.select("v"))
        .distinct()
        .count()
    )
    assert df["n_members"].sum() == n_vertices
    assert (df["min_member"] <= df["max_member"]).all()
    # a community's label is one of the vertex ids (mode of initial ids)
    assert (df["community"] >= 0).all()


def test_logreg_scores_are_probabilities(spark):
    df = run("q_logreg_score_text", spark)
    assert df["score_q6"].between(0, 1_000_000).all()
    assert ((df["pred"] == 1) == (df["score_q6"] >= 500_000)).all()
    assert df["ttr_q6"].between(0, 1_000_000).all()


def test_apriori_antimonotonicity(spark):
    df = run("q_basket_triples_apriori", spark)
    if len(df) == 0:
        pytest.skip("no frequent triples at this SF")
    for c in ("sup_ab", "sup_ac", "sup_bc"):
        assert (df[c] >= df["support"]).all(), f"{c} violates antimonotonicity"
    assert (df["brand_a"] < df["brand_b"]).all()
    assert (df["brand_b"] < df["brand_c"]).all()


def test_incremental_dedup_verdicts(spark):
    df = run("q_dedup_incremental_snapshot", spark)
    assert (df["doc_id"] % 2 == 1).all()  # incoming snapshot only
    dups = df[df["is_dup"] == 1]
    assert (dups["best_match"] % 2 == 0).all()  # matches live in the corpus
    # every reported match passed the exact-Jaccard >= 0.5 verify
    assert (2 * dups["j_num"] >= dups["j_den"]).all()
    assert df.loc[df["is_dup"] == 0, "best_match"].isna().all()


def test_compaction_bins_cover_all_rows(spark):
    import duckdb

    df = run("q_compaction_bin_packing", spark)
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    con.close()
    assert df["total_rows"].sum() == n
    assert (df["first_file"] <= df["last_file"]).all()
    assert ((df["needs_compaction"] == 1) == (df["n_files"] > 1)).all()


def test_bottomk_estimator_bounds(spark):
    df = run("q_bottomk_coordinated_sample", spark)
    assert (df["est_num"] <= df["k_used"]).all()
    assert (df["j_num"] <= df["j_den"]).all()
    assert df["est_q6"].between(0, 1_000_000).all()
    assert df["true_q6"].between(0, 1_000_000).all()


def test_silhouette_range_and_nearest_other(spark):
    df = run("q_silhouette_simplified", spark)
    assert df["s_q6"].between(-1_000_000, 1_000_000).all()
    assert (df["nearest_other"] != df["label"]).all()


def test_rank_correlations_in_range(spark):
    kt = run("q_kendall_tau", spark)
    assert kt["tau_b_q6"].between(-1_000_000, 1_000_000).all()
    assert (
        kt["n_concordant"] + kt["n_discordant"] <= kt["n_days"] * (kt["n_days"] - 1) // 2
    ).all()
    sr = run("q_spearman_rho", spark)
    assert sr["rho_q6"].between(-1_000_000, 1_000_000).all()
    # the synthetic fixture draws price independently of quantity (unlike
    # real TPC-H), so rho is ~0 — pin the independence, not a correlation
    assert abs(sr["rho_q6"].iloc[0]) < 100_000
    assert sr["nx_distinct"].iloc[0] == 50  # quantity histogram grain


def test_anova_f_nonnegative(spark):
    df = run("q_anova_oneway", spark)
    assert (df["f_stat_q6"] >= 0).all()
    assert (df["ssb_floor"] >= 0).all() and (df["ssw_floor"] >= 0).all()
    assert df["k"].iloc[0] == 5


def test_seasonal_decomposition_reconstructs(spark):
    df = run("q_seasonal_decompose", spark)
    # x*1e6 == trend + seasonal + residual up to the three floors
    err = (
        df["x_cents"] * 1_000_000
        - (df["trend_q6"] + df["seasonal_q6"] + df["residual_q6"])
    ).abs()
    assert (err <= 3).all()
    # full-window contract: edge days are excluded
    assert df["day_ix"].min() == 3 and df["day_ix"].max() == 26


def test_two_stage_rerank_ordering(spark):
    df = run("q_ann_rerank_two_stage", spark)
    assert set(df["rank"]) <= {1, 2, 3}
    for _, g in df.groupby("query_id"):
        g = g.sort_values("rank")
        assert (g["cos_q6"].diff().dropna() <= 0).all()
    assert (df["neighbor_id"] != df["query_id"]).all()


def test_psi_terms_nonnegative_and_bins_cover(spark):
    df = run("q_psi_drift", spark)
    # every PSI term is >= 0 up to quantization: (p-q) and ln(p/q) share sign
    assert (df["psi_term_q6"] >= -1).all()
    assert len(df) <= 10


def test_ece_terms_bounded_by_bin_mass(spark):
    df = run("q_ece_calibration", spark)
    n = df["n_b"].sum()
    # |acc - conf| <= 1, so each term <= bin mass (in millionths)
    assert (df["ece_term_q6"] * n <= df["n_b"] * 1_000_000 + n).all()
    assert (df["n_pos"] <= df["n_b"]).all()


def test_woe_iv_terms_nonnegative(spark):
    df = run("q_woe_binning", spark)
    # IV terms are (a-b)ln(a/b) >= 0 up to quantization
    assert (df["iv_term_q6"] >= -1).all()
    assert (df["n_good"] >= 0).all() and (df["n_bad"] >= 0).all()


def test_tree_leaves_partition_orders(spark):
    import duckdb

    df = run("q_decision_tree_score", spark)
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM '{SF}/orders.parquet'").fetchone()[0]
    con.close()
    assert df["n"].sum() == n
    assert df["actual_rate_q6"].between(0, 1_000_000).all()
    assert df["leaf_id"].between(0, 7).all()


def test_clustering_coefficient_range(spark):
    df = run("q_clustering_coefficient", spark)
    assert df["coeff_q6"].between(0, 1_000_000).all()
    assert (df["degree"] >= 2).all()
    # T(v) can never exceed the wedge count d(d-1)/2
    assert (2 * df["n_triangles"] <= df["degree"] * (df["degree"] - 1)).all()


def test_bpe_apply_compresses_known_words(spark):
    df = run("q_bpe_apply_merges", spark).set_index("word")
    assert df.loc["table", "n_tokens"] == 1  # full merge chain t-able
    assert df.loc["hash", "n_tokens"] == 2  # h + as merge
    assert (df["n_tokens"] <= df["n_chars"]).all()
    assert (df["n_tokens"] >= 1).all()


def test_skipgram_pairs_symmetric_and_negatives_in_vocab(spark):
    df = run("q_skipgram_negative_sampling", spark)
    v = df["center"].nunique()
    assert (df["neg1_idx"] < v).all() and (df["neg2_idx"] < v).all()
    assert (df["center_idx"] < v).all()
    # the +-w window is symmetric: pair counts match transposed
    m = df.set_index(["center", "context"])["n_pairs"]
    t = df.set_index(["context", "center"])["n_pairs"]
    common = m.index.intersection(t.index)
    assert len(common) == len(m)  # every pair has its transpose
    assert (m.loc[common] == t.loc[common]).all()


def test_temperature_mixing_upsamples_small_sources(spark):
    df = run("q_temperature_mixing", spark)
    assert abs(df["weight_q6"].sum() - 1_000_000) <= len(df)  # weights sum to 1
    # alpha < 1 compresses: smallest source gets the largest repeat factor
    smallest = df.loc[df["n_docs"].idxmin()]
    largest = df.loc[df["n_docs"].idxmax()]
    assert smallest["exp_epochs_q6"] >= largest["exp_epochs_q6"]


def test_incremental_dedup_fast_agrees_with_portable_twin(spark):
    """The xxhash64 production variant and its md5 portable twin must
    reach the SAME per-document dup verdicts (different hash families,
    same banded-LSH + exact-verify pipeline; the exact verify makes the
    verdict hash-family-independent for every candidate both surface)."""
    fast = run("q_dedup_incremental_fast", spark).set_index("doc_id")
    slow = run("q_dedup_incremental_snapshot", spark).set_index("doc_id")
    assert (fast["is_dup"] == slow["is_dup"]).all()
    both = fast[fast["is_dup"] == 1]
    assert (both["best_match"] == slow.loc[both.index, "best_match"]).all()


def test_preference_pairs_have_positive_margin(spark):
    df = run("q_preference_pairs", spark)
    assert (df["margin_q6"] >= 0).all()
    assert (df["chosen_doc"] != df["rejected_doc"]).all()
    assert df["source"].is_unique


def test_tokenizer_fertility_bounds(spark):
    df = run("q_tokenizer_fertility", spark)
    # merges only ever shrink: 1 <= fertility <= chars-per-word
    assert (df["n_tokens"] <= df["n_chars"]).all()
    assert (df["n_tokens"] >= df["n_words"]).all()
    assert (df["fertility_q6"] >= 1_000_000).all()


def test_bleu_precision_range_and_dup_pairs_score_high(spark):
    df = run("q_bleu_ngram_precision", spark)
    assert df["p1_q6"].between(0, 1_000_000).all()
    assert df["p2_q6"].between(0, 1_000_000).all()
    # bigram precision never exceeds unigram precision on these pairs
    # (any matched bigram implies both unigrams matched)
    assert (df["p2_q6"] <= df["p1_q6"] + 1).all()
    # verified near-dups (J >= 0.5) share most unigrams
    assert (df["p1_q6"] > 500_000).all()


def test_hll_estimates_within_error_bounds(spark):
    df = run("q_hll_set_algebra", spark)
    # standard error for m=256 is ~1.04/sqrt(256) = 6.5%; allow 4 sigma
    rel = (df["est_union"] - df["exact_union"]).abs() / df["exact_union"]
    assert (rel < 0.26).all(), rel.max()
    # intersection via inclusion-exclusion inherits both errors; check
    # the additive-error version against the union magnitude
    abs_err = (df["est_inter"] - df["exact_inter"]).abs()
    assert (abs_err < 0.5 * df["exact_union"]).all()


def test_forecast_backtest_consistency(spark):
    df = run("q_forecast_backtest", spark)
    assert (df["ape_q6"] >= 0).all() and (df["ape_naive_q6"] >= 0).all()
    # the verdict column must agree with the two APE columns (up to the
    # independent floors, strict inequality on the unfloored ratios can
    # only flip at exact ties)
    disagree = df[(df["model_beats_naive"] == 1) & (df["ape_q6"] > df["ape_naive_q6"])]
    assert len(disagree) == 0
    # first forecastable day is day 1 (day 0 has no prior forecast)
    assert df["day_ix"].min() == 1


def test_span_corruption_layout(spark):
    df = run("q_span_corruption_masking", spark)
    assert (df["n_masked"] <= df["n_tokens"]).all()
    # every sentinel span covers at least one masked token (chained
    # overlapping starts can make one island arbitrarily long, so there
    # is no upper bound per span)
    assert (df["n_masked"] >= df["n_spans"]).all()
    assert ((df["n_spans"] == 0) == (df["n_masked"] == 0)).all()
    # corpus-level realized corruption lands near the designed 15%
    ratio = df["n_masked"].sum() / df["n_tokens"].sum()
    assert 0.08 < ratio < 0.25, ratio


def test_shard_manifest_covers_corpus_and_balances(spark):
    import duckdb

    df = run("q_dataset_shard_manifest", spark)
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    con.close()
    assert df["n_docs"].sum() == n
    assert len(df) == 16
    # hash sharding balances within a loose factor at fixture scale
    assert df["bytes_balance_q6"].between(300_000, 3_000_000).all()

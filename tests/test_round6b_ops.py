"""Structural invariants for the late-round-6 analytics / mlops /
SQL-surface operators — properties the driver's oracle-equality check
cannot state (frontier domination, estimator bounds, fold integrity,
feature-semantics parity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES
from kafka_stream_service_spark.tables import tables

SF = "/root/testdata/sf0.001"


def test_skyline_is_mutually_nondominated(spark):
    """No frontier point may dominate another frontier point — and the
    frontier must dominate or tie every non-frontier part."""
    rows = QUERIES["q_skyline_pareto"].spark_fn(spark, SF).collect()
    assert rows
    pts = [(r.price_cents, r.p_size) for r in rows]
    for p in pts:
        for q in pts:
            dominated = (
                q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            )
            assert not dominated, (p, q)
    # every part is dominated-or-tied by some frontier point
    part = tables(spark, SF)["part"].select(
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("pc"),
        F.col("p_size").cast("int").alias("sz"),
    )
    for r in part.collect():
        assert any(
            q[0] <= r.pc and q[1] >= r.sz for q in pts
        ), (r.pc, r.sz)


def test_mad_outliers_bounded_and_nonnegative(spark):
    for r in QUERIES["q_mad_outliers"].spark_fn(spark, SF).collect():
        assert r.mad >= 0
        assert 0 <= r.n_outliers <= r.n
        # with >= 50% of mass within the MAD by construction, outliers
        # at 3*MAD must be a strict minority
        assert r.n_outliers < r.n / 2


def test_autocorr_in_valid_range(spark):
    r = QUERIES["q_autocorr_lag"].spark_fn(spark, SF).collect()[0]
    # ACF is a correlation: |acf| <= 1 (ppm scale)
    assert -1_000_000 <= r.acf1_ppm <= 1_000_000
    assert -1_000_000 <= r.acf7_ppm <= 1_000_000
    assert r.n > 100


def test_mom_growth_delta_consistency(spark):
    rows = (
        QUERIES["q_mom_growth"].spark_fn(spark, SF).orderBy("month_ts").collect()
    )
    assert rows[0].delta is None and rows[0].growth_bp is None
    for prev, cur in zip(rows, rows[1:]):
        assert abs(cur.delta - (cur.revenue - prev.revenue)) < 1e-6


def test_attribution_conserves_purchases(spark):
    """Every purchase is attributed exactly once: channel counts must sum
    to the total purchase count, and channels are non-purchase types."""
    out = QUERIES["q_attribution_last_touch"].spark_fn(spark, SF).collect()
    ev = tables(spark, SF)["events"]
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.conversions for r in out) == n_purch
    assert all(r.channel != "purchase" for r in out)


def test_auc_identities(spark):
    r = QUERIES["q_eval_auc_pr"].spark_fn(spark, SF).collect()[0]
    assert 0 <= r.auc_ppm <= 1_000_000
    assert r.tp + r.fn == r.n_pos
    assert 0 <= r.precision_ppm <= 1_000_000
    assert 0 <= r.recall_ppm <= 1_000_000
    docs = tables(spark, SF)["documents"]
    assert r.n_pos == docs.filter(F.col("lang") == "en").count()
    assert r.n_pos + r.n_neg == docs.count()


def test_calibration_bins_partition_corpus(spark):
    rows = QUERIES["q_calibration_bins"].spark_fn(spark, SF).collect()
    assert len(rows) == 10
    n_docs = tables(spark, SF)["documents"].count()
    assert sum(r.n for r in rows) == n_docs
    # ntile balance: bin sizes differ by at most 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # mean score must be monotone nondecreasing across score-ordered bins
    by_bin = [r.mean_score_micro for r in sorted(rows, key=lambda r: r.bin)]
    assert by_bin == sorted(by_bin)


def test_group_kfold_no_source_spans_folds(spark):
    """The defining property of a group split: fold-local source counts
    must sum to the GLOBAL distinct-source count (no source in 2 folds),
    and every document lands in exactly one fold."""
    rows = QUERIES["q_group_kfold"].spark_fn(spark, SF).collect()
    docs = tables(spark, SF)["documents"]
    assert sum(r.n_docs for r in rows) == docs.count()
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_sources for r in rows) == n_sources
    assert all(0 <= r.fold <= 4 for r in rows)


def test_bigram_lm_scores_every_multitoken_doc(spark):
    out = QUERIES["q_bigram_lm_score"].spark_fn(spark, SF)
    docs = tables(spark, SF)["documents"]
    multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    rows = out.collect()
    assert len(rows) == multi
    for r in rows:
        # add-1 smoothed probabilities are < 1 -> strictly negative ll
        assert r.ll_micro < 0
        assert r.mean_micro <= 0
        assert r.n_bigrams >= 1


def test_lateral_topn_matches_window_form(spark):
    """The LATERAL correlated subquery must agree row-for-row with the
    classic window-rank formulation it decorrelates into."""
    out = QUERIES["q_lateral_topn"].spark_fn(spark, SF)
    t = tables(spark, SF)
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ref = (
        t["customer"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_custkey",
            F.col("c_acctbal").cast("decimal(12,2)").cast("double").alias("acctbal"),
        )
    )
    assert out.exceptAll(ref).count() == 0
    assert ref.exceptAll(out).count() == 0


def test_null_safe_join_surplus_is_null_cross_product(spark):
    """The null-safe join adds EXACTLY n_null_cust * n_null_supp matches
    over the plain equi-join — the semantics in one identity."""
    r = QUERIES["q_null_safe_join"].spark_fn(spark, SF).collect()[0]
    assert r.n_nullsafe - r.n_equi == r.n_null_cust * r.n_null_supp
    assert r.n_null_cust > 0 and r.n_null_supp > 0  # the dirtying bites


def test_variant_shred_totals(spark):
    out = QUERIES["q_variant_shred"].spark_fn(spark, SF).collect()
    ev = tables(spark, SF)["events"]
    assert sum(r.n for r in out) == ev.count()
    assert {r.t for r in out} == {
        x.event_type for x in ev.select("event_type").distinct().collect()
    }


def test_recursive_hops_chain_arithmetic(spark):
    """On per-customer chains the k-hop pair count has a closed form:
    sum over customers of max(len_c - k, 0)."""
    out = {
        r.hops: r.n_pairs
        for r in QUERIES["q_hops_recursive_cte"].spark_fn(spark, SF).collect()
    }
    t = tables(spark, SF)
    lens = [
        r["cnt"]
        for r in t["orders"].groupBy("o_custkey").agg(F.count("*").alias("cnt")).collect()
    ]
    for k in (1, 2, 3):
        assert out.get(k, 0) == sum(max(n - k, 0) for n in lens), k


def test_chi2_nonnegative_and_dof(spark):
    r = QUERIES["q_chi2_independence"].spark_fn(spark, SF).collect()[0]
    assert r.chi2_micro >= 0
    assert r.dof == (5 - 1) * (7 - 1)  # 5 event types x 7 weekdays
    assert r.n_cells <= 35
    ev_n = tables(spark, SF)["events"].count()
    assert r.n == ev_n


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_langs): entropy maximized by the uniform mix."""
    import math

    for r in QUERIES["q_entropy_by_source"].spark_fn(spark, SF).collect():
        assert 0 <= r.h_micro <= math.log(r.n_langs) * 1e6 + 1
        assert r.n_langs >= 1


def test_gini_in_unit_interval_and_matches_numpy(spark):
    r = QUERIES["q_gini_concentration"].spark_fn(spark, SF).collect()[0]
    assert 0 <= r.gini_ppm <= 1_000_000
    # independent reference implementation
    t = tables(spark, SF)["orders"]
    vals = sorted(
        x.v
        for x in t.groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100))
            .cast("bigint")
            .alias("v")
        )
        .collect()
    )
    n = len(vals)
    sv = sum(vals)
    iv = sum((i + 1) * v for i, v in enumerate(vals))
    import math

    expect = math.floor((2.0 * iv - (n + 1.0) * sv) * 1e6 / (n * sv))
    assert r.gini_ppm == expect
    assert r.n_customers == n


def test_seasonal_deviation_orders_by_magnitude(spark):
    rows = QUERIES["q_seasonal_weekday_deviation"].spark_fn(spark, SF).collect()
    assert len(rows) == 20
    mags = [abs(r.dev_ppm) for r in rows]
    assert mags == sorted(mags, reverse=True)
    assert all(0 <= r.wd <= 6 for r in rows)


def test_stream_topk_leaderboard_shape(spark):
    """Each closed hour carries rank 1 (and at most rank 2), counts are
    rank-monotone, and no provisional/duplicate emission exists."""
    rows = QUERIES["q_stream_topk_window_replay"].spark_fn(spark, SF).collect()
    by_hour = {}
    for r in rows:
        by_hour.setdefault(r.hour_start, {})[r.rnk] = r.n_events
    assert by_hour
    for h, ranks in by_hour.items():
        assert 1 in ranks, h
        assert set(ranks) <= {1, 2}, h  # no dup ranks -> no double emission
        if 2 in ranks:
            assert ranks[1] >= ranks[2], h


def test_time_travel_history_is_immutable(spark):
    """Epoch-0 must read identically before and after the epoch-1 merge,
    replaying a committed epoch must be a no-op, and uncommitted epochs
    must not be served."""
    rows = QUERIES["q_snapshot_time_travel"].spark_fn(spark, SF).collect()
    e0 = {r.k: r.v for r in rows if r.as_of == "epoch0"}
    e1 = {r.k: r.v for r in rows if r.as_of == "epoch1"}
    assert e0 and e1
    # deletes: keys with k % 12 == 1 exist in history but not current
    deleted = [k for k in e0 if k % 12 == 1]
    assert deleted and all(k not in e1 for k in deleted)
    # updates: +5 exactly
    for k in e0:
        if k % 12 != 1 and k % 8 == 1:
            assert abs(e1[k] - (e0[k] + 5)) < 1e-9
    # inserts exist only in current
    assert any(k % 4 == 2 for k in e1)
    assert all(k % 4 == 1 for k in e0)
    # the writer refuses future epochs
    from kafka_stream_service_spark.eos import MergeIdempotentSnapshotWriter
    from kafka_stream_service_spark.queries._util import work_dir
    import os

    # NB: work_dir() wipes on entry — reconstruct the path without wiping
    import hashlib, tempfile

    root = os.path.join(tempfile.gettempdir(), f"kssp_work_{os.getuid()}")
    path = os.path.join(
        root, f"ttravel_{hashlib.md5(SF.encode()).hexdigest()[:8]}", "tbl"
    )
    w = MergeIdempotentSnapshotWriter(path, key="k")
    assert w.committed_epoch() == 1
    assert w.snapshot_at(spark, 2) is None


def test_collated_join_counts(spark):
    r = QUERIES["q_collated_join"].spark_fn(spark, SF).collect()[0]
    assert r.n_insensitive >= r.n_sensitive
    assert r.n_insensitive > r.n_sensitive  # the mangling bites
    brands = (
        tables(spark, SF)["part"].select("p_brand").distinct().count()
    )
    assert r.n_distinct_ci == brands  # CI collapses the mangled copies
    assert r.n_insensitive == brands  # 1:1 brand match under CI


def test_arrow_surfaces_agree_with_catalyst(spark):
    """The three Arrow-path queries must agree with pure-Catalyst
    recomputations — the Python boundary is lossless."""
    r = {x.event_type: x for x in QUERIES["q_udaf_grouped_agg"].spark_fn(spark, SF).collect()}
    ev = tables(spark, SF)["events"].select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("v"),
        F.get_json_object("props", "$.k").cast("bigint").alias("w"),
    )
    ref = {
        x.event_type: x
        for x in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum(F.col("v") * F.col("w")) * 1000000 / F.sum("w"))
            .cast("bigint")
            .alias("wm"),
        )
        .collect()
    }
    assert set(r) == set(ref)
    for k in ref:
        assert (r[k].n, r[k].wmean_micro) == (ref[k].n, ref[k].wm), k

    m = QUERIES["q_arrow_map_batches"].spark_fn(spark, SF).collect()[0]
    d = tables(spark, SF)["documents"]
    assert m.n_docs == d.count()
    assert m.total_tokens == d.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]

    g = {x.lang: x for x in QUERIES["q_arrow_grouped_stats"].spark_fn(spark, SF).collect()}
    for lang, row in g.items():
        assert row.min_chars <= row.median_lo_chars <= row.max_chars, lang


def test_entity_resolution_cluster_identities(spark):
    """Canonical label is a member (min key), sizes sum to node count,
    and every same-cluster pair is connected within its brand block."""
    rows = QUERIES["q_entity_resolution"].spark_fn(spark, SF).collect()
    n_nodes = (
        tables(spark, SF)["part"].filter(F.col("p_partkey") < 400).count()
    )
    assert len(rows) == n_nodes
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cl, members in by_cluster.items():
        assert min(m.p_partkey for m in members) == cl  # min-key label
        assert all(m.n_members == len(members) for m in members)


def test_binaryfile_ingest_covers_all_staged_images(spark):
    rows = QUERIES["q_binaryfile_ingest"].spark_fn(spark, SF).collect()
    d = tables(spark, SF)["documents"].filter(F.col("doc_id") % 9 == 0)
    assert len(rows) == d.count()
    assert all(r.n_bytes_match for r in rows)
    for r in rows:
        assert r.width == 16 + r.doc_id % 17
        assert r.height == 12 + r.doc_id % 13


def test_dynamic_gap_sessions_error_events_extend(spark):
    """Interval-union semantics: session count must be <= the fixed
    30-min session count (longer error gaps can only merge sessions,
    never split them), and each session's end >= last event + 30 min."""
    dyn = QUERIES["q_session_window_dynamic_gap"].spark_fn(spark, SF)
    fixed = QUERIES["q_session_window"].spark_fn(spark, SF)
    assert dyn.count() <= fixed.count()
    r = dyn.agg(
        F.min(
            F.col("session_end").cast("timestamp").cast("long")
            - F.col("session_start").cast("timestamp").cast("long")
        )
    ).collect()[0][0]
    assert r >= 30 * 60  # every session spans at least the minimum gap


def test_order_cycle_time_priority_profile(spark):
    rows = QUERIES["q_order_cycle_time"].spark_fn(spark, SF).collect()
    assert len(rows) == 5  # five order priorities
    for r in rows:
        assert 0 <= r.p50_days <= r.p90_days <= r.max_days


def test_statestore_reader_partition_spread(spark):
    """The state source must expose per-partition stores: with 4 state
    partitions, keys appear across multiple partition_ids and exactly
    cover the input (white-box: nothing beyond what the query holds)."""
    out = QUERIES["q_statestore_introspection"].spark_fn(spark, SF)
    n = tables(spark, SF)["events"].count()
    assert out.count() == n
    # re-read the same checkpoint raw to check partition spread
    import os, tempfile, hashlib

    root = os.path.join(tempfile.gettempdir(), f"kssp_work_{os.getuid()}")
    ckpt = os.path.join(
        root, f"ssintro_{hashlib.md5(SF.encode()).hexdigest()[:8]}", "ckpt"
    )
    st = spark.read.format("statestore").load(ckpt)
    parts = st.select("partition_id").distinct().count()
    assert parts > 1


def test_fanout_sinks_mutually_consistent(spark):
    """Cross-sink reconciliation: replaying the log's change events
    through last-write-wins must reproduce the snapshot exactly."""
    QUERIES["q_stream_fanout_dual_sink_replay"].spark_fn(spark, SF).collect()
    import hashlib, os, tempfile

    root = os.path.join(tempfile.gettempdir(), f"kssp_work_{os.getuid()}")
    base = os.path.join(root, f"fanout_{hashlib.md5(SF.encode()).hexdigest()[:8]}")
    log = spark.read.parquet(os.path.join(base, "log", "batch_id=*")).withColumn(
        "epoch",
        F.regexp_extract(F.input_file_name(), r"batch_id=(\d+)", 1).cast("int"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.col("epoch").desc())
    replayed = (
        log.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select("k", "v")
    )
    from kafka_stream_service_spark.eos import MergeIdempotentSnapshotWriter

    snap = MergeIdempotentSnapshotWriter(os.path.join(base, "snap"), key="k").current(
        spark
    )
    assert replayed.exceptAll(snap).count() == 0
    assert snap.exceptAll(replayed).count() == 0


def test_available_now_second_run_processes_only_delta(spark):
    """Across the two availableNow invocations the epoch ledger must
    show non-overlapping batches and the union must cover every event
    exactly once (no re-read of the backlog on invocation 2)."""
    out = QUERIES["q_stream_available_now_incremental"].spark_fn(spark, SF)
    n_total = sum(r.n for r in out.collect())
    assert n_total == tables(spark, SF)["events"].count()
    import hashlib, os, tempfile

    root = os.path.join(tempfile.gettempdir(), f"kssp_work_{os.getuid()}")
    base = os.path.join(root, f"savailnow_{hashlib.md5(SF.encode()).hexdigest()[:8]}")
    log = spark.read.parquet(os.path.join(base, "out", "batch_id=*"))
    # exactly-once across invocations: no event_id appears twice
    dup = log.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_distributed_ranks_are_a_permutation(spark):
    """Global ranks must be exactly 1..N with no gaps or duplicates."""
    from kafka_stream_service_spark.operators.ranks import (
        RANK_COL,
        with_global_ranks,
    )

    orders = tables(spark, SF)["orders"].select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.col("o_orderkey").alias("tb"),
    )
    ranked = with_global_ranks(orders, "v", "tb", num_partitions=8)
    n = orders.count()
    agg = ranked.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct(RANK_COL).alias("dst"),
        F.min(RANK_COL).alias("mn"),
        F.max(RANK_COL).alias("mx"),
    ).collect()[0]
    assert (agg.cnt, agg.dst, agg.mn, agg.mx) == (n, n, 1, n)
    # rank order agrees with the value order on a sample
    rows = ranked.orderBy(RANK_COL).limit(100).collect()
    vals = [r.v for r in rows]
    assert vals == sorted(vals)


def test_hll_merge_partials_bounded(spark):
    """Each committed partial holds at most 256 register rows — the
    fixed-size-state claim, checked on the actual epoch directories."""
    QUERIES["q_stream_hll_merge_replay"].spark_fn(spark, SF).collect()
    import hashlib, os, tempfile

    root = os.path.join(tempfile.gettempdir(), f"kssp_work_{os.getuid()}")
    base = os.path.join(root, f"shllmerge_{hashlib.md5(SF.encode()).hexdigest()[:8]}")
    for epoch_dir in sorted(os.listdir(os.path.join(base, "partials"))):
        if not epoch_dir.startswith("batch_id="):
            continue
        n = spark.read.parquet(os.path.join(base, "partials", epoch_dir)).count()
        assert 0 < n <= 256, epoch_dir


def test_twap_between_min_max(spark):
    """A weighted mean must lie inside the value range of its type."""
    out = {r.event_type: r for r in QUERIES["q_time_weighted_average"].spark_fn(spark, SF).collect()}
    ev = tables(spark, SF)["events"].groupBy("event_type").agg(
        (F.min(F.col("value").cast("decimal(10,2)") * 100)).alias("mn"),
        (F.max(F.col("value").cast("decimal(10,2)") * 100)).alias("mx"),
    )
    for r in ev.collect():
        t = out[r.event_type]
        assert int(r.mn) * 10000 <= t.twap_micro <= int(r.mx) * 10000, r.event_type
        assert t.total_dt_us > 0


def test_source_overlap_symmetric_complete(spark):
    rows = QUERIES["q_source_overlap_matrix"].spark_fn(spark, SF).collect()
    docs = tables(spark, SF)["documents"]
    n_src = docs.select("source").distinct().count()
    # every pair with at least one shared bigram appears at most once
    pairs = {(r.src_a, r.src_b) for r in rows}
    assert len(pairs) == len(rows)
    assert len(rows) <= n_src * (n_src - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.jaccard_ppm <= 1_000_000


def test_weighted_median_within_range_and_weight_conservation(spark):
    out = {r.event_type: r for r in QUERIES["q_weighted_median"].spark_fn(spark, SF).collect()}
    ev = tables(spark, SF)["events"].select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("v"),
        F.get_json_object("props", "$.k").cast("bigint").alias("wt"),
    )
    stats = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"), F.sum("wt").alias("w"))
        .collect()
    }
    for t, r in out.items():
        assert stats[t].mn <= r.wmedian_cents <= stats[t].mx, t
        assert r.total_weight == stats[t].w, t


def test_lorenz_curve_convex_to_equality(spark):
    rows = sorted(
        QUERIES["q_lorenz_curve"].spark_fn(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)  # monotone
    assert shares[-1] >= 999_999  # bottom 100% holds everything
    # Lorenz curve lies on or below the equality diagonal
    for r in rows:
        assert r.cum_share_ppm <= r.decile * 100_000 + 1

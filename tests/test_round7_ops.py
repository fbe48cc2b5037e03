"""Structural invariants for round-7 operators — properties the driver's
oracle-equality check cannot state (conservation laws, definitional
identities, planted-input behavior).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_markov_rows_conserve_transitions(spark):
    """Column law: n_from_prev equals the sum of n_trans over each
    prev_type row group, and total transitions = total events - one per
    user (each user's first event has no predecessor)."""
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_markov_transitions"].spark_fn(spark, SF).collect()
    by_prev: dict[str, int] = {}
    for r in out:
        by_prev.setdefault(r.prev_type, 0)
        by_prev[r.prev_type] += r.n_trans
    for r in out:
        assert r.n_from_prev == by_prev[r.prev_type]
    ev = tables(spark, SF)["events"]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_trans for r in out) == n_events - n_users


def test_activity_bitmap_popcount_equals_active_days(spark):
    out = QUERIES["q_activity_bitmap"].spark_fn(spark, SF).collect()
    assert out, "no users"
    for r in out:
        assert bin(r.day_mask).count("1") == r.n_active_days
        # mask bounds agree with first/last day bits
        assert r.day_mask >> r.last_day == 1 or r.day_mask >> r.last_day == 1
        assert (r.day_mask >> r.first_day) & 1 == 1
        assert r.day_mask < (1 << (r.last_day + 1))


def test_islands_partition_the_active_days(spark):
    """Streaks tile the active-day set: total_active_days equals the
    bitmap's popcount, longest <= span, and streak count >= 1."""
    bm = {
        r.user_id: r
        for r in QUERIES["q_activity_bitmap"].spark_fn(spark, SF).collect()
    }
    for r in QUERIES["q_run_length_islands"].spark_fn(spark, SF).collect():
        b = bm[r.user_id]
        assert r.total_active_days == b.n_active_days
        assert r.first_day == b.first_day and r.last_day == b.last_day
        assert 1 <= r.n_streaks <= r.total_active_days
        assert r.longest_streak <= r.last_day - r.first_day + 1


def test_window_count_distinct_matches_batch_distinct(spark):
    from kafka_stream_service_spark.tables import tables

    out = {
        r.user_id: r
        for r in QUERIES["q_window_count_distinct"].spark_fn(spark, SF).collect()
    }
    truth = (
        tables(spark, SF)["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("d"),
        )
        .collect()
    )
    for t in truth:
        assert out[t.user_id].n_events == t.n
        assert out[t.user_id].n_distinct_types == t.d


def test_decile_lift_monotone_and_conserves(spark):
    rows = sorted(
        QUERIES["q_decile_lift"].spark_fn(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert rows[-1].cum_n == sum(r.n for r in rows)
    assert rows[-1].cum_pos == sum(r.n_pos for r in rows)
    # final bucket lift is exactly 1 (cum = totals)
    assert rows[-1].lift_num == rows[-1].lift_den
    # cumulative counts strictly increase
    for a, b in zip(rows, rows[1:]):
        assert b.cum_n > a.cum_n


def test_calendar_gap_fill_is_dense(spark):
    out = QUERIES["q_calendar_gap_fill"].spark_fn(spark, SF)
    per_type = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
    ).collect()
    spans = {(r.d0, r.d1) for r in per_type}
    assert len(spans) == 1, "every type shares the global spine"
    for r in per_type:
        assert r.n_days == (r.d1 - r.d0).days + 1


def test_target_encoding_between_prior_and_category_mean(spark):
    """Shrinkage law: the encoded value lies strictly between the raw
    category mean and the global prior (for categories whose mean
    differs from the prior)."""
    for r in QUERIES["q_target_encoding"].spark_fn(spark, SF).collect():
        enc = r.enc_num / r.enc_den
        cat_mean = r.sum_cents / r.n
        lo, hi = sorted([cat_mean, _global_prior(r)])
        assert lo - 1e-9 <= enc <= hi + 1e-9


def _global_prior(row) -> float:
    # enc_num = sum*g_n + 10*g_sum ; enc_den = (n+10)*g_n
    # solve prior = g_sum/g_n from the row's own algebra:
    g_sum_10 = row.enc_num - row.sum_cents * (row.enc_den // (row.n + 10))
    g_n = row.enc_den // (row.n + 10)
    return (g_sum_10 / 10) / g_n


def test_minmax_scaling_bounds(spark):
    for r in QUERIES["q_minmax_scaling"].spark_fn(spark, SF).collect():
        assert r.min_cents < r.max_cents
        # mean scaled value lies in [0, 1e6]
        assert 0 <= r.sum_scaled_ppm <= r.n * 1_000_000


def test_systematic_sample_interval(spark):
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_systematic_sample"].spark_fn(spark, SF).collect()
    n_orders = tables(spark, SF)["orders"].count()
    assert len(out) == (n_orders + 24) // 25
    keys = sorted(r.o_orderkey for r in out)
    assert len(set(keys)) == len(keys)


def test_sql_udf_matches_python_reference(spark):
    from kafka_stream_service_spark.tables import tables

    out = {r.l_returnflag: r for r in QUERIES["q_sql_udf"].spark_fn(spark, SF).collect()}
    rows = tables(spark, SF)["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_discount"
    ).collect()
    ref: dict[str, int] = {}
    for r in rows:
        ref[r.l_returnflag] = ref.get(r.l_returnflag, 0) + round(
            r.l_extendedprice * 100
        ) * (100 - round(r.l_discount * 100))
    for flag, total in ref.items():
        assert out[flag].gross_c4 == total


def test_percent_rank_cume_definitional(spark):
    rows = QUERIES["q_percent_rank_cume"].spark_fn(spark, SF).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg_rows in by_seg.values():
        n = len(seg_rows)
        for r in seg_rows:
            assert r.pr_den == n - 1 and r.cd_den == n
            # cume count = number of rows with bal <= this row's bal
            manual = sum(1 for x in seg_rows if x.bal_cents <= r.bal_cents)
            assert r.cd_num == manual
            # percent-rank numerator = rows strictly below
            assert r.pr_num == sum(1 for x in seg_rows if x.bal_cents < r.bal_cents)


def test_fuzzy_pairs_are_symmetric_free_and_bounded(spark):
    rows = QUERIES["q_fuzzy_match_levenshtein"].spark_fn(spark, SF).collect()
    seen = set()
    for r in rows:
        assert r.gram_a < r.gram_b, "canonical ordering"
        assert 1 <= r.dist <= 2
        assert (r.gram_a, r.gram_b) not in seen
        seen.add((r.gram_a, r.gram_b))


def test_scd1_upsert_key_conservation(spark):
    from kafka_stream_service_spark.tables import tables

    out = QUERIES["q_scd1_upsert"].spark_fn(spark, SF).collect()
    o = tables(spark, SF)["orders"]
    n_orders = o.count()
    n_updated = o.filter(F.col("o_orderkey") % 4 == 0).count()
    assert sum(r.n_rows for r in out) == n_orders, "merge never changes key count"
    u = {r.status: r for r in out}["U"]
    assert u.n_rows == n_updated


def test_ngram_novelty_bounds(spark):
    for r in QUERIES["q_ngram_novelty"].spark_fn(spark, SF).collect():
        assert 0 <= r.n_unique_grams <= r.n_grams


def test_jaccard_neighbors_edge_pairs_have_common_neighbor(spark):
    rows = QUERIES["q_jaccard_neighbors"].spark_fn(spark, SF).collect()
    for r in rows:
        assert r.x < r.y
        assert 1 <= r.n_common <= min(r.deg_x, r.deg_y)
        assert r.jac_den == r.deg_x + r.deg_y - r.n_common
        assert r.is_adjacent in (0, 1)


def test_image_ahash_identical_images_identical_hashes(spark, tmp_path):
    """Planted duplicates: two doc_ids that are both 0 mod 11 with the
    SAME text and the same dims-class produce the same pixel stream and
    therefore the same aHash — and a different text produces a
    different hash (on this fixture)."""
    import duckdb
    import os

    base = "/root/testdata/sf0.001"
    con = duckdb.connect()
    # doc 0 and doc 2431*11? dims depend on doc_id (w: %17, h: %13, c: %2)
    # -> choose clone_id = donor + 11*17*13*2 = donor + 4862: same dims
    # class, same parity, same text => identical pixels.
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{base}/documents.parquet')
          UNION ALL
          SELECT doc_id + 4862, text, lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet')
          WHERE doc_id = (SELECT MIN(doc_id) FROM
                          read_parquet('{base}/documents.parquet')
                          WHERE doc_id % 11 = 0)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"""
    )
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(base, f), tmp_path / f)
    rows = {
        r.doc_id: r
        for r in QUERIES["q_image_ahash"].spark_fn(spark, str(tmp_path)).collect()
    }
    donor = min(k for k in rows if k % 11 == 0 and k + 4862 in rows)
    a, b = rows[donor], rows[donor + 4862]
    assert (a.width, a.height, a.hash_lo, a.hash_hi) == (
        b.width,
        b.height,
        b.hash_lo,
        b.hash_hi,
    )
    others = [r for k, r in rows.items() if k not in (donor, donor + 4862)]
    assert any(
        (r.hash_lo, r.hash_hi) != (a.hash_lo, a.hash_hi) for r in others
    ), "hash must discriminate distinct images"


def test_image_ahash_bits_fit_32(spark):
    for r in QUERIES["q_image_ahash"].spark_fn(spark, SF).collect():
        assert 0 <= r.hash_lo < (1 << 32)
        assert 0 <= r.hash_hi < (1 << 32)

"""Edge cases for the audit / tokenizer / span-dedup operators
(queries/quality_ops.py) that the clean driver fixtures never exercise:
planted constraint violations, planted FK orphans, exact BPE pair
arithmetic, planted repeated spans, and partial-merge == recompute.
"""

from __future__ import annotations

from datetime import datetime

from kafka_stream_service_spark.queries import QUERIES


def test_data_quality_report_flags_planted_violations(spark, tmp_path):
    rows = [
        # (orderkey, custkey, totalprice, status, priority, date)
        (1, 10, 100.0, "O", "1-URGENT", "1995-01-01"),
        (1, None, -5.0, "X", "2-HIGH", "1990-06-01"),  # dup key, null FK, neg, bad status, old date
        (2, 11, 50.0, "F", "1-URGENT", "1996-03-04"),
        (3, 11, 0.0, "P", "3-MEDIUM", "1997-07-08"),  # 0 is non-positive
    ]
    df = spark.createDataFrame(
        [(k, c, t, s, p, datetime.strptime(d, "%Y-%m-%d").date()) for k, c, t, s, p, d in rows],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string, o_orderdate date",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.metric: r.value
        for r in QUERIES["q_data_quality_report"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out["row_count"] == 4.0
    assert out["o_custkey_null_count"] == 1.0
    assert out["o_orderkey_duplicate_rows"] == 1.0
    assert out["o_totalprice_nonpositive"] == 2.0
    assert out["o_orderstatus_invalid"] == 1.0
    assert out["o_orderdate_out_of_range"] == 1.0
    assert out["o_totalprice_min"] == -5.0 and out["o_totalprice_max"] == 100.0


def test_referential_integrity_detects_planted_orphan(spark, tmp_path):
    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )

    w("nation", "n_nationkey long", [(0,), (1,)])
    w("customer", "c_custkey long, c_nationkey long", [(10, 0), (11, 1), (12, 1)])
    # o_custkey=99 has no customer row -> one orphan on orders->customer
    w("orders", "o_orderkey long, o_custkey long", [(100, 10), (101, 99)])
    w("part", "p_partkey long", [(1,)])
    w("supplier", "s_suppkey long", [(1,)])
    w(
        "lineitem",
        "l_orderkey long, l_partkey long, l_suppkey long",
        [(100, 1, 1), (101, 1, 1)],
    )
    out = {
        r.edge: r
        for r in QUERIES["q_referential_integrity"].spark_fn(spark, str(tmp_path)).collect()
    }
    oc = out["orders->customer"]
    assert oc.orphan_rows == 1
    assert oc.child_rows == 2 and oc.child_keys == 2 and oc.parent_keys == 3
    # customer 11 and 12 place no orders
    assert oc.unreferenced_parents == 2
    assert out["lineitem->orders"].orphan_rows == 0
    assert out["customer->nation"].orphan_rows == 0


def test_bpe_pair_counts_exact(spark, tmp_path):
    """wc('ab')=2, wc('abc')=2 -> pair 'ab' = 2+2, 'bc' = 2; one-char
    words contribute nothing."""
    df = spark.createDataFrame(
        [(1, "ab ab abc x", "en", "s"), (2, "abc y", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q_bpe_merge_candidates"].spark_fn(spark, str(tmp_path)).collect()
    counts = {r.pair: r.pair_count for r in rows}
    assert counts == {"ab": 4, "bc": 2}
    # ordering: count desc then pair asc
    assert [r.pair for r in rows] == ["ab", "bc"]


def test_repeated_ngram_spans_planted(spark, tmp_path):
    """Docs 1 and 2 share the exact 5-gram 'a b c d e'; doc 3 shares
    nothing and must not appear (inner join on hits)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e x", "en", "s"),  # spans: [a b c d e], [b c d e x]
            (2, "z a b c d e", "en", "s"),  # spans: [z a b c d], [a b c d e]
            (3, "p q r s t", "en", "s"),  # 1 span, unique
            (4, "too short", "en", "s"),  # no spans at all
        ],
        "doc_id long, text string, lang string, source string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q_repeated_ngram_spans"].spark_fn(spark, str(tmp_path)).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1, 2}
    for d in (1, 2):
        assert by_doc[d].total_spans == 2
        assert by_doc[d].repeated_spans == 1
        assert by_doc[d].repeat_ratio == 0.5


def test_incremental_merge_equals_full_recompute(spark, tmp_path):
    """Partial-agg merge across the 2024-01-24 split must equal the
    monolithic recompute exactly (decimal merge algebra), including on
    the boundary hour that receives rows from BOTH sides."""
    base = datetime(2024, 1, 23, 22, 30)
    rows = []
    for i in range(200):
        # crosses the split at i==36 (23:00 + minutes): straddles both sides
        ts = datetime(2024, 1, 23, 22, 0) + (i * (datetime(2024, 1, 24, 2, 0) - datetime(2024, 1, 23, 22, 0)) / 200)
        rows.append((i, ts, i % 7, ["click", "view"][i % 2], round(0.01 * i, 2), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["q_incremental_cagg_merge"].spark_fn(spark, str(tmp_path)).collect()
    from pyspark.sql import functions as F

    expected = (
        df.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    )
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    assert sorted(map(tuple, out)) == sorted(map(tuple, expected))
    # sanity: the fixture really does straddle the split
    assert any(r.window_start >= datetime(2024, 1, 24, 0, 0) for r in out)
    assert any(r.window_start < datetime(2024, 1, 24, 0, 0) for r in out)


def test_event_transitions_probabilities_normalize(spark, sf_dir):
    rows = QUERIES["q_event_transitions"].spark_fn(spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    assert by_prev and all(abs(s - 1.0) < 1e-9 for s in by_prev.values())


def test_key_skew_profile_ordering_and_shares(spark, sf_dir):
    rows = QUERIES["q_key_skew_profile"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(0.0 < r.share < 1.0 for r in rows)


def test_embedding_outliers_planted(spark, tmp_path):
    """Three tight vectors + one far vector in label 0: the far one must
    rank first; scaled distances are exact integers."""
    rows = [
        (1, [10.0, 0.0], 0),
        (2, [10.0, 1.0], 0),
        (3, [10.0, -1.0], 0),
        (4, [-127.0, 90.0], 0),  # the planted outlier
        (5, [5.0, 5.0], 1),
        (6, [5.0, 6.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["q_embedding_outliers"].spark_fn(spark, str(tmp_path)).collect()
    label0 = sorted([r for r in out if r.label == 0], key=lambda r: r.rank)
    assert label0[0].vec_id == 4 and label0[0].rank == 1
    # distances are scaled by n^2: rank-invariant, integer-exact
    assert all(isinstance(r.dist_scaled, int) for r in out)
    # every label emits at most 5 rows
    from collections import Counter

    assert all(v <= 5 for v in Counter(r.label for r in out).values())


def test_length_bucketing_boundaries(spark, tmp_path):
    docs = [
        (1, " ".join(["w"] * 16), "en", "s"),  # exactly 16 -> bucket 16, pad 0
        (2, " ".join(["w"] * 17), "en", "s"),  # 17 -> bucket 32, pad 15
        (3, " ".join(["w"] * 200), "en", "s"),  # >128 -> bucket 256
        (4, "one", "en", "s"),  # 1 -> bucket 16, pad 15
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.bucket: r for r in QUERIES["q_length_bucketing"].spark_fn(spark, str(tmp_path)).collect()}
    assert out[16].n_docs == 2 and out[16].pad_tokens == 15
    assert out[32].n_docs == 1 and out[32].pad_tokens == 15
    assert out[256].n_docs == 1 and out[256].pad_tokens == 56
    assert out[16].pad_frac == 15 / 32


def test_vocab_coverage_exact_thresholds(spark, tmp_path):
    """10 'a' + 6 'b' + 4 'c' = 20 tokens. Integer thresholds: 50% needs
    {a} (10*100 >= 20*50), 75% needs {a,b} (16*100 >= 20*75), 99% needs
    all three."""
    spark.createDataFrame(
        [(1, " ".join(["a"] * 10 + ["b"] * 6 + ["c"] * 4), "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.target_pct: r for r in QUERIES["q_vocab_coverage"].spark_fn(spark, str(tmp_path)).collect()}
    assert out[50].vocab_size == 1 and out[50].covered_tokens == 10
    assert out[75].vocab_size == 2 and out[75].covered_tokens == 16
    assert out[90].vocab_size == 3 and out[90].covered_tokens == 20  # 16*100 < 20*90
    assert out[99].vocab_size == 3 and out[99].covered_tokens == 20


def test_groupwise_regression_exact_line(spark, tmp_path):
    """Perfect line y_cents = 3x gives the exact rational 3/1 (slope
    3.0, cents/sec); a single-point user has den=0 -> NULL slope."""
    base = datetime(2024, 1, 1, 0, 0, 0)
    from datetime import timedelta

    rows = []
    for i, sec in enumerate((0, 60, 120, 300)):
        rows.append((i, base + timedelta(seconds=sec), 1, "click", 0.03 * sec, "{}"))
    rows.append((99, base, 2, "view", 5.0, "{}"))  # lone point: no slope
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.user_id: r for r in QUERIES["q_groupwise_regression"].spark_fn(spark, str(tmp_path)).collect()}
    u1 = out[1]
    assert u1.slope_num / u1.slope_den == 3.0 and u1.slope == 3.0
    assert out[2].slope is None and out[2].slope_den == 0


def test_text_roundtrip_preserves_tab_in_text(spark, tmp_path):
    """The bounded split(_, tab, 3) must keep a TAB inside the free-text
    tail intact instead of truncating the document at it."""
    docs = [(7, "before\tafter the tab", "en", "s"), (8, "plain words", "de", "s")]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in QUERIES["q_text_roundtrip"].spark_fn(spark, str(tmp_path)).collect()}
    assert out["en"].n_docs == 1 and out["en"].total_chars == len("before\tafter the tab")
    assert out["de"].min_doc == 8


def test_stream_semi_join_emits_once_per_left(spark, tmp_path):
    """One purchase with THREE in-window clicks must appear exactly once;
    a purchase whose only click came after it must not appear."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # purchase 100 at 12:00 with clicks at 11:10/11:30/11:50 (3 matches)
        (100, base, 1, "purchase", 1.0, "{}"),
        (2, base - timedelta(minutes=50), 1, "click", 1.0, "{}"),
        (4, base - timedelta(minutes=30), 1, "click", 1.0, "{}"),
        (6, base - timedelta(minutes=10), 1, "click", 1.0, "{}"),
        # purchase 101: click exists but AFTER the purchase -> no match
        (101, base, 2, "purchase", 1.0, "{}"),
        (8, base + timedelta(minutes=5), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["q_stream_semi_join_replay"].spark_fn(spark, str(tmp_path)).collect()
    assert [(r.purchase_id, r.user_id) for r in out] == [(100, 1)]


def test_jaccard_prefix_join_finds_planted_pair(spark, tmp_path):
    """Two docs sharing most trigrams must pair with the exact Jaccard;
    an unrelated doc must not appear anywhere."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"  # differs in last token
    c = "one two three four five six seven eight"
    spark.createDataFrame(
        [(1, a, "en", "s"), (2, b, "en", "s"), (3, c, "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q_jaccard_prefix_join"].spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # 6 trigrams each, 5 shared -> J = 5/7 >= 0.7
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.inter == 5 and r.size_a == 6 and r.size_b == 6
    assert r.jaccard == 5 / 7


def test_winsorized_stats_clips_planted_outliers(spark, tmp_path):
    """20 values of 10.00 plus outliers 0.01 and 9999.99: the discrete
    p05/p95 are 10.00, so both outliers clip and the winsorized sum is
    exactly 22 * 10.00."""
    rows = [(i, "A", 10.0) for i in range(20)] + [(90, "A", 0.01), (91, "A", 9999.99)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = QUERIES["q_winsorized_stats"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.p05 == 10.0 and r.p95 == 10.0
    assert r.clipped_low == 1 and r.clipped_high == 1
    assert r.winsorized_sum == 220.0


def test_corpus_drift_identical_halves_zero_kl(spark, tmp_path):
    """Identical token distributions in both halves -> KL exactly 0.0
    (every term ln(1) = 0; smoothing keeps p == q when counts match)."""
    text = "x y z x y"
    docs = [(0, text, "en", "s"), (1, text, "en", "s")]  # parity halves identical
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["q_corpus_drift_kl"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].kl_ab == 0.0


def test_mode_per_group_deterministic_tie_break(spark, tmp_path):
    """Equal counts must resolve to the alphabetically first value, not
    an engine-defined pick."""
    rows = [(1, "O", "2-HIGH"), (2, "O", "1-URGENT"), (3, "F", "3-MEDIUM")]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.o_orderstatus: r for r in QUERIES["q_mode_per_group"].spark_fn(spark, str(tmp_path)).collect()}
    assert out["O"].mode_priority == "1-URGENT" and out["O"].mode_count == 1
    assert out["F"].mode_priority == "3-MEDIUM"


def test_referential_integrity_null_keys_agree_with_oracle(spark, tmp_path):
    """The r5 ADVICE scenario: NULL FKs and NULL parent keys — exactly
    the dirty data an RI audit targets. Spark result must match the
    registered DuckDB oracle on BOTH semantics points (NULL children
    are not orphans, NULL parents are not unreferenced), not just on
    clean fixtures."""
    import duckdb

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )

    w("nation", "n_nationkey long", [(0,), (1,), (None,)])
    # c_nationkey NULL: NOT an orphan (counted by q_data_quality_report)
    w("customer", "c_custkey long, c_nationkey long", [(10, 0), (11, None), (12, 9)])
    w("orders", "o_orderkey long, o_custkey long", [(100, 10), (101, None)])
    w("part", "p_partkey long", [(1,)])
    w("supplier", "s_suppkey long", [(1,)])
    w(
        "lineitem",
        "l_orderkey long, l_partkey long, l_suppkey long",
        [(100, 1, 1), (101, 1, 1)],
    )
    out = {
        r.edge: r
        for r in QUERIES["q_referential_integrity"].spark_fn(spark, str(tmp_path)).collect()
    }
    # c_nationkey=9 orphan, NULL ignored; NULL nation key never "unreferenced"
    cn = out["customer->nation"]
    assert cn.orphan_rows == 1
    assert cn.unreferenced_parents == 1  # nation 1 (NULL parent excluded)
    oc = out["orders->customer"]
    assert oc.orphan_rows == 0  # NULL o_custkey is not an orphan

    # and the full row set matches the DuckDB oracle on the same files
    con = duckdb.connect()
    for t in ["nation", "customer", "orders", "part", "supplier", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    oracle = {r[0]: r for r in con.execute(QUERIES["q_referential_integrity"].oracle).fetchall()}
    for edge, r in out.items():
        o = oracle[edge]
        assert (
            r.child_rows, r.child_keys, r.parent_keys, r.orphan_rows, r.unreferenced_parents
        ) == tuple(o[1:]), edge


def test_text_roundtrip_newlines_and_nulls(spark, tmp_path):
    """The r5 ADVICE scenario: embedded CR/LF would split one document
    into multiple write.text lines, and NULL lang/text would shift
    fields under concat_ws's NULL-skip. The hardened query must keep
    one line per document (newlines flattened length-preservingly) and
    parse NULLs as empty fields."""
    docs = [
        (1, "line one\nline two\r\nline three", "en", "s"),
        (2, None, "en", "s"),
        (3, "plain", None, "s"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in QUERIES["q_text_roundtrip"].spark_fn(spark, str(tmp_path)).collect()}
    en = out["en"]
    assert en.n_docs == 2  # doc 1 stayed ONE line; doc 2 (null text) survived
    assert en.total_chars == len("line one\nline two\r\nline three")  # length-preserving
    assert en.min_doc == 1 and en.max_doc == 2
    assert out[""].n_docs == 1 and out[""].min_doc == 3  # null lang -> ''


def test_embedding_outliers_rejects_ragged_vectors(spark, tmp_path):
    """The uniform-dimension guard (r5 ADVICE): ragged embeddings within
    a label must raise loudly instead of silently diverging from the
    oracle's per-position counts."""
    import pytest as _pytest

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0], 0),
        (2, [2.0, 3.0], 0),  # ragged within label 0
        (3, [1.0, 1.0, 1.0, 1.0], 1),
        (4, [2.0, 2.0, 2.0, 2.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    with _pytest.raises(Exception, match="ragged"):
        QUERIES["q_embedding_outliers"].spark_fn(spark, str(tmp_path)).collect()

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

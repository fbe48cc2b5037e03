"""Unit tests for the LLM-data operator tier: connected components, IVF
recall vs the exact baseline, dedup cluster canonicalization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.operators.graph import connected_components
from kafka_stream_service_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} (self-edge only)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "src long, dst long"
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges(spark):
    # a 12-node chain needs label propagation over several hops
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    got = {r.node: r.comp for r in connected_components(edges, max_iter=15).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_connected_components_bounded_plan_size(spark):
    """The iterative loop must truncate lineage (localCheckpoint every 5
    iterations): the returned frame's logical plan is a checkpoint scan
    plus at most ~4 iterations of joins, NOT the full 10+-iteration chain
    — unbounded growth means planner blowup at cluster scale."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    labels = connected_components(edges, max_iter=15)
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    # a checkpointed lineage surfaces as a scan of materialized rows
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan[:2000]
    # the full uncheckpointed 13-iteration loop would render 13+ joins;
    # post-checkpoint only the tail iterations remain (each renders twice
    # in the InMemoryRelation's cached-plan text)
    assert plan.count("Join") <= 8, f"{plan.count('Join')} joins — lineage not truncated"


def test_lsh_pair_expansion_matches_combinations(spark):
    """The in-bucket pair generator (groupBy + JVM combination expansion,
    which replaced the band self-join) must produce exactly
    itertools.combinations of each bucket's sorted ids, deduped across
    bands, with hot buckets dropped by the cap — pinned on a constructed
    corpus where bucket membership is forced via identical signatures."""
    import itertools

    from kafka_stream_service_spark.operators import lsh_candidate_pairs

    # 4 docs share signature A (one bucket of 4), 2 share B, 1 unique;
    # k=4 / bands=2 => each signature yields 2 identical (band, bucket)
    # groups, exercising the cross-band dedup
    sig_a, sig_b, sig_c = [1, 2, 3, 4], [9, 9, 8, 8], [7, 6, 5, 4]
    rows = [(i, sig_a) for i in (10, 30, 20, 40)] + [(i, sig_b) for i in (2, 1)] + [(99, sig_c)]
    docs = spark.createDataFrame(rows, "doc_id long, sig array<long>")
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(docs, id_col="doc_id", k=4, bands=2, sig_col="sig").collect()
    }
    want = set(itertools.combinations(sorted((10, 20, 30, 40)), 2)) | {(1, 2)}
    assert got == want
    # the hot-bucket cap drops the 4-doc bucket entirely, keeping the pair
    capped = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            docs, id_col="doc_id", k=4, bands=2, sig_col="sig", max_bucket_size=3
        ).collect()
    }
    assert capped == {(1, 2)}


def test_lsh_recall_against_exact_jaccard(spark):
    """Quantified correctness bound for the LSH candidate generator: on
    the sf0.01 corpus, candidates must capture >= 0.9 of the TRUE
    near-dup pairs (exact shingle Jaccard >= 0.5, brute-forced over all
    C(500,2) pairs). With k=16/bands=4 the theoretical capture is
    1-(1-J^4)^4 — only ~23% at J=0.5 but ~98.5% at J=0.9; the fixture's
    near-dups are all J >= 0.9, so 0.9 is a sound bound, and the exact
    baseline here guards against the fixture drifting toward weaker
    overlaps where the banding config would need more bands."""
    import itertools

    from kafka_stream_service_spark.operators import lsh_candidate_pairs, minhash_frame
    from kafka_stream_service_spark.tables import tables

    d = tables(spark, SF)["documents"]
    sh = minhash_frame(d, n=3, k=16).filter(F.size("shingles") > 0).persist()
    try:
        shingle_sets = {r.doc_id: set(r.shingles) for r in sh.select("doc_id", "shingles").collect()}
        exact = set()
        for a, b in itertools.combinations(sorted(shingle_sets), 2):
            sa, sb = shingle_sets[a], shingle_sets[b]
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= 0.5:
                exact.add((a, b))
        lsh = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(
                sh, id_col="doc_id", shingle_col="shingles", k=16, bands=4, sig_col="sig"
            ).collect()
        }
    finally:
        sh.unpersist()
    assert exact, "fixture corpus must contain true near-dup pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} < 0.9 ({len(exact)} true pairs)"
    # bucketing must PRUNE: the candidate set stays orders below all-pairs
    n_docs = len(shingle_sets)
    assert len(lsh) < n_docs * (n_docs - 1) // 20, "LSH produced near-all-pairs output"


def test_ivf_recall_against_bruteforce(spark):
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_knn_cosine_bruteforce"].spark_fn(spark, SF).collect()
    }
    ivf = {(r.query_id, r.neighbor_id) for r in QUERIES["q_knn_ivf"].spark_fn(spark, SF).collect()}
    recall = len(bf & ivf) / len(bf)
    # random gaussian embeddings are IVF's worst case; probing 8/16 cells
    # must still recover a solid majority of true neighbors
    assert recall >= 0.6, f"IVF recall collapsed: {recall}"


def test_distributed_ivf_trainer_recall(spark):
    """The fully distributed Lloyd trainer (the no-driver-sample path —
    q_knn_ivf uses the sampled trainer) must still produce centroids
    good enough for >= 0.6 recall against brute force, and its update
    step must agree with the numpy trainer when the 'sample' is the
    whole corpus (same init, same argmin ties, same means)."""
    from pyspark.sql import functions as F

    from kafka_stream_service_spark.operators.ivf import (
        ivf_knn,
        train_ivf_centroids,
        train_ivf_centroids_sampled,
    )
    from kafka_stream_service_spark.tables import tables

    e = tables(spark, SF)["embeddings"]
    dist = train_ivf_centroids(e, k=16, iterations=2)
    # sampled trainer over a sample >= corpus size sees every vector =>
    # identical Lloyd trajectory (to float tolerance)
    full = train_ivf_centroids_sampled(e, k=16, iterations=2, sample_size=10**6)
    for cd, cf in zip(dist, full):
        assert max(abs(a - b) for a, b in zip(cd, cf)) < 1e-6

    q = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_knn_cosine_bruteforce"].spark_fn(spark, SF).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(e, q, dist, k=5, n_probe=8).collect()
    }
    assert len(bf & ivf) / len(bf) >= 0.6


def test_int8_knn_preserves_fp32_ranking(spark):
    """The int8-quantized top-5 must recover nearly all fp32 top-5
    neighbors — the quality bound that justifies shipping the
    4x-compressed index. Empirically 39/40 at sf0.01; assert >= 0.9."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_knn_cosine_bruteforce"].spark_fn(spark, SF).collect()
    }
    q8 = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_knn_cosine_int8"].spark_fn(spark, SF).collect()
    }
    assert len(bf & q8) / len(bf) >= 0.9


def test_dedup_clusters_canonical_invariants(spark):
    rows = QUERIES["q_dedup_clusters"].spark_fn(spark, SF).collect()
    assert rows, "expected near-dup clusters in the fixture corpus"
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cluster, members in by_cluster.items():
        # exactly one canonical per cluster, and it is the min doc_id
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1
        assert canon[0].doc_id == min(m.doc_id for m in members) == cluster


def test_tfidf_sanity(spark):
    rows = QUERIES["q_tfidf_top_terms"].spark_fn(spark, SF).collect()
    assert rows
    # ubiquitous tokens (df ~ n_docs) get ~zero idf; tfidf never negative
    # beyond the smoothing epsilon
    assert all(r.tfidf >= -1e-6 or r.tf_count > 0 for r in rows)
    by_doc_token = {(r.doc_id, r.token): r for r in rows}
    assert len(by_doc_token) == len(rows), "duplicate (doc, token) rows"


def test_ngrams_short_and_null_docs(spark, tmp_path):
    """Docs with fewer than n tokens (0/1/2 tokens, NULL text) must yield
    EMPTY n-gram arrays — not an ArrayIndexOutOfBoundsException.
    Unguarded ``sequence(1, size-(n-1))`` counts DOWN to [1, 0] when
    size < n (step defaults to -1), feeding element_at index 0 under
    ANSI mode. Regression test for functions/text.py:ngrams."""
    from kafka_stream_service_spark.functions.text import ngrams, tokens
    from kafka_stream_service_spark.queries.text import q_text_repetition

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one"), (3, "two tokens"), (4, "a b a b c d")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.bi, r.tri)
        for r in df.select(
            "doc_id",
            ngrams(tokens(F.col("text")), 2).alias("bi"),
            ngrams(tokens(F.col("text")), 3).alias("tri"),
        ).collect()
    }
    assert got[0] == ([], [])
    assert got[1] == ([], [])
    assert got[2] == ([], [])
    assert got[3] == (["two tokens"], [])
    assert got[4][0] == ["a b", "b a", "a b", "b c", "c d"]
    assert got[4][1] == ["a b a", "b a b", "a b c", "b c d"]

    # the first consumer (q_text_repetition) must run on the same degenerate
    # corpus and, like the DuckDB oracle, emit rows only for docs with >= 1
    # bigram (explode drops empty arrays; the oracle's UNNEST(range(1,1))
    # likewise emits nothing for short docs)
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = q_text_repetition(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {3, 4}


def test_frame_sample_empty_payload_yields_no_rows(spark, tmp_path):
    """Empty payloads must produce zero frames, not an 'Illegal sequence
    boundaries' crash (queries/multimodal2.py guards sequence(0, -1, k)
    behind a CaseWhen; the oracle's range(0, 0, k) is naturally empty)."""
    import pandas as pd

    from kafka_stream_service_spark.queries.multimodal2 import q_multimodal_frame_sample

    docs = pd.DataFrame(
        {
            "doc_id": [0, 11, 22],  # doc_id % 11 == 0 passes the query filter
            "text": ["", "x" * 100, ""],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(docs).write.mode("overwrite").parquet(str(d))
    rows = q_multimodal_frame_sample(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {11}, "empty docs must emit no frames"
    assert len(rows) == 1  # ceil(100/32)=4 frames, stride 4 keeps frame 0


def test_approx_aggregates_error_bounds(spark):
    """The query reduces the approx aggregates to exact counterparts plus
    error-bound booleans (the engine-portable form the driver oracle
    hashes); the bound columns ARE the quantified check — a broken
    HLL/t-digest flips one to False here and in the gate."""
    row = QUERIES["q_approx_aggregates"].spark_fn(spark, SF).collect()[0]
    assert row.exact_orders > 0
    assert row.exact_median_cents_x2 > 0
    assert row.hll_within_5pct is True
    assert row.tdigest_within_5pct is True


def test_simhash_separates_near_dups_from_background(spark):
    """Quantified bound for the rows-only SimHash op, grounded in the
    measured fixture geometry: same-domain docs share vocabulary, so the
    background Hamming distance is ~13 bits (NOT the 32 of independent
    random docs — template-generated corpora correlate heavily). The
    signal that makes SimHash usable is the SEPARATION: true near-dup
    pairs (shingle Jaccard >= 0.5; measured mean 5.6, max 11) must
    average well below the background mean (measured 13.2)."""
    import itertools

    from kafka_stream_service_spark.operators import minhash_frame
    from kafka_stream_service_spark.operators.dedup import simhash_frame
    from kafka_stream_service_spark.tables import tables

    d = tables(spark, SF)["documents"]
    sh = minhash_frame(d, n=3, k=16).filter(F.size("shingles") > 0)
    shingle_sets = {r.doc_id: set(r.shingles) for r in sh.select("doc_id", "shingles").collect()}
    near = []
    for a, b in itertools.combinations(sorted(shingle_sets), 2):
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= 0.5:
            near.append((a, b))
    assert near
    fp = {r.doc_id: r.simhash for r in simhash_frame(d).collect()}

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    near_d = [ham(fp[a], fp[b]) for a, b in near]
    ids = sorted(fp)[:60]
    near_set = set(near)
    far_d = [
        ham(fp[a], fp[b])
        for a, b in itertools.combinations(ids, 2)
        if (a, b) not in near_set
    ]
    near_mean = sum(near_d) / len(near_d)
    far_mean = sum(far_d) / len(far_d)
    assert max(near_d) <= 16, f"near-dup hamming too large: {max(near_d)}"
    assert near_mean <= 8, f"near-dup mean drifted: {near_mean}"
    assert far_mean >= near_mean + 4, f"no separation: near {near_mean} vs far {far_mean}"


def test_hyperplane_lsh_buckets_capture_planted_twins(spark):
    """Quantified recall bound for the rows-only hyperplane-LSH op. The
    gaussian fixture has no natural high-cosine pairs (measured max
    0.47), so near-dups are PLANTED: each of 40 vectors gets a twin
    perturbed by 5% relative deterministic noise (cosine ~0.999). The
    8-bit bucket must put >= 0.6 of twin pairs in the same bucket —
    theory: P = (1 - theta/pi)^8 ~ 0.9 at theta ~ 2.6 degrees."""
    import numpy as np

    from kafka_stream_service_spark.queries.similarity import hyperplane_bucket
    from kafka_stream_service_spark.tables import tables

    e = tables(spark, SF)["embeddings"].filter(F.col("vec_id") < 40)
    rows = [(r.vec_id, list(map(float, r.embedding))) for r in e.collect()]
    planted = []
    for vid, v in rows:
        arr = np.asarray(v)
        rng = np.random.default_rng(vid)  # deterministic per-vector noise
        noise = rng.standard_normal(len(arr))
        twin = arr + 0.05 * np.linalg.norm(arr) / np.linalg.norm(noise) * noise
        planted.append((vid, v))
        planted.append((vid + 10_000, list(map(float, twin))))
    df = spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    buckets = {
        r.vec_id: r.b
        for r in df.select("vec_id", hyperplane_bucket(F.col("embedding")).alias("b")).collect()
    }
    same = sum(1 for vid, _ in rows if buckets[vid] == buckets[vid + 10_000])
    recall = same / len(rows)
    assert recall >= 0.6, f"twin bucket-collision rate {recall} < 0.6"


def test_unigram_logprob_multi_chunk_docs_match_oracle(spark, tmp_path):
    """The two-level chunked summation crosses its 256-token chunk
    boundary only on long documents (the fixture docs top out at ~31
    distinct tokens), so drive it with synthetic docs at 10 / 256 / 257 /
    600 distinct tokens and compare Spark vs the DuckDB oracle exactly —
    the multi-chunk fold must stay bit-identical after the 6-digit round."""
    import duckdb

    from kafka_stream_service_spark.queries import QUERIES

    docs = []
    for doc_id, n_tok in [(1, 10), (2, 256), (3, 257), (4, 600)]:
        # zipf-ish repeats so token frequencies differ across docs
        toks = [f"w{doc_id}_{i}" for i in range(n_tok) for _ in (range(2) if i % 7 == 0 else range(1))]
        text = " ".join(toks)
        docs.append((doc_id, text, "en", "synth", len(text)))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    spec = QUERIES["q_text_unigram_logprob"]
    got = {
        r.doc_id: (r.n_tokens, r.avg_logprob, r.keep)
        for r in spec.spark_fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        int(d): (int(n), float(a), bool(k))
        for d, n, a, k in con.execute(spec.oracle).fetchall()
    }
    assert set(got) == set(want) == {1, 2, 3, 4}
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1], f"doc {d}: {got[d][1]} != {want[d][1]}"
        assert got[d][2] == want[d][2]


def test_integer_pagerank_known_path_graph(spark):
    """Hand-computed fixed-point values for the path graph 1-2-3
    (scale 1e6, damping 85%, teleport 150000):

    iter 1: ends get 425000 inflow (center's 850000 split by deg 2),
    center gets 850000+850000; iter 2 re-propagates the skewed ranks.
    Exact integers — any deviation is an implementation bug, not noise.
    """
    from kafka_stream_service_spark.operators.graph import integer_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u int, v int")
    r1 = {r.id: r.rank for r in integer_pagerank(edges, iterations=1).collect()}
    assert r1 == {1: 575000, 2: 1850000, 3: 575000}
    r2 = {r.id: r.rank for r in integer_pagerank(edges, iterations=2).collect()}
    assert r2 == {1: 936250, 2: 1127500, 3: 936250}
    # symmetry: the two ends are structurally identical, every iteration
    r5 = integer_pagerank(edges, iterations=5).collect()
    by = {r.id: r.rank for r in r5}
    assert by[1] == by[3]
    assert {r.deg for r in r5 if r.id in (1, 3)} == {1}


def test_portable_hash64_pinned_values(spark):
    """The portable-twin oracles depend on portable_hash64 and the
    Rademacher plane matrix being EXACTLY these constructions — pin
    golden values so an innocent-looking refactor (different seed
    format, different hex slice) fails here before it fails 5 oracles."""
    import hashlib

    from pyspark.sql import functions as F

    from kafka_stream_service_spark.queries.clustering import _rademacher_planes
    from kafka_stream_service_spark.queries.dedup2 import portable_hash64

    row = (
        spark.range(1)
        .select(
            portable_hash64(F.lit("abc"), 0).alias("h0"),
            portable_hash64(F.lit("abc"), 7).alias("h7"),
            portable_hash64(F.lit(""), 0).alias("he"),
        )
        .collect()[0]
    )
    def ref(seed, s):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    assert row.h0 == ref(0, "abc")
    assert row.h7 == ref(7, "abc")
    assert row.he == ref(0, "")
    assert 0 <= row.h0 < 2**60  # positive 60-bit: safe in bigint everywhere

    planes = _rademacher_planes()
    assert len(planes) == 8 and all(len(p) == 64 for p in planes)
    assert all(c in (-1, 1) for p in planes for c in p)
    # golden prefix of plane 0 (md5 parity of "plane:0:<i>")
    want = [1 if hashlib.md5(f"plane:0:{i}".encode()).digest()[0] % 2 == 0 else -1 for i in range(8)]
    assert planes[0][:8] == want

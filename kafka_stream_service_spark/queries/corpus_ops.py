"""Corpus-engineering operators: benchmark decontamination, inverted
index construction, and skew-salted joins.

These extend the LLM-data surface (SURVEY.md north-star: training-data
pipeline ops at 100 TB) past dedup/similarity into the remaining
pipeline stages a real pretraining corpus build runs: removing eval-set
contamination, building token->doc posting lists for corpus search, and
keeping shuffle-joins alive under key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


def _trigrams(toks: F.Column) -> F.Column:
    """Distinct word trigrams (array<string>); docs under 3 tokens yield
    an empty array (sequence would count DOWN below 3 tokens — same
    guard as functions/text.py:ngrams)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i.cast("int")),
            F.element_at(toks, (i + 1).cast("int")),
            F.element_at(toks, (i + 2).cast("int")),
        ),
    )
    return F.when(F.size(toks) >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "q_decontaminate_ngram",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1), i ->
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t WHERE len(toks) >= 3
    ),
    bench AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 23 = 0),
    corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 23 != 0)
    SELECT c.doc_id,
           COUNT(DISTINCT c.gram) AS overlap_ngrams,
           COUNT(DISTINCT b.bench_id) AS bench_docs,
           (COUNT(DISTINCT c.gram) >= 10) AS contaminated
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    HAVING COUNT(DISTINCT c.gram) >= 3
    """,
    tags=("text", "decontamination", "llm-data"),
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM recipe): flag training
    documents sharing word-trigram spans with a held-out benchmark set
    (here the deterministic doc_id % 23 slice standing in for an eval
    suite). A doc with >= 10 distinct overlapping trigrams is a
    contamination hit (near-dup of a benchmark doc); >= 3 is the review
    threshold.

    Scale shape: the benchmark side is tiny by construction (eval suites
    are thousands of docs, the corpus is billions), so its exploded
    n-gram set broadcasts — the corpus n-grams stream map-side through
    the broadcast hash join and only matched (doc_id, gram, bench_id)
    rows enter the counting shuffle. No corpus self-join anywhere.
    """
    from ._util import pin_iterative_aqe_floor

    # tiny-shuffle agg chain (two countDistincts over the matched rows):
    # 1m AQE floor — the r15 driver's 0.76x regression on this row was
    # floor collateral (r16 evidence: cross-HEAD A/B vs a464521 1.49x,
    # focused floor A/B 1.37x, headline-wide A/B 1.28x, all same-session
    # interleaved)
    pin_iterative_aqe_floor(spark)
    d = tables(spark, sf_dir)["documents"]
    # materialize the token array in its OWN projection: passing the raw
    # split() expression into the trigram lambda would inline it into
    # every element_at — re-splitting the text 3x per position, O(len^2)
    # per row (measured 4.7s -> ~1s for the full explode at sf0.1)
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    grams = t.select("doc_id", F.explode(_trigrams(F.col("toks"))).alias("gram"))
    bench = grams.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    corpus = grams.filter(F.col("doc_id") % 23 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("overlap_ngrams"),
            F.countDistinct("bench_id").alias("bench_docs"),
        )
        .filter(F.col("overlap_ngrams") >= 3)
        .select(
            "doc_id",
            "overlap_ngrams",
            "bench_docs",
            (F.col("overlap_ngrams") >= 10).alias("contaminated"),
        )
    )


@query(
    "q_inverted_index",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS token
      FROM t
    ),
    df AS (SELECT token, COUNT(*) AS df_count FROM big GROUP BY token),
    sharded AS (
      SELECT big.doc_id, big.token, df.df_count,
             big.doc_id % CAST(ceil(df.df_count / 128.0) AS BIGINT) AS shard
      FROM big JOIN df USING (token)
      WHERE df.df_count >= 3
    )
    SELECT token, CAST(shard AS INT) AS shard,
           CAST(MAX(df_count) AS BIGINT) AS df_count,
           COUNT(*) AS shard_df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM sharded
    GROUP BY token, shard
    """,
    tags=("text", "index", "llm-data"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: bigram term -> sorted posting list of
    the documents containing it (the search-engine/corpus-lookup
    primitive), with HEAD-TERM SHARDING — postings of frequent terms
    split into ceil(df/128) (term, shard) rows by doc_id modulus, the
    production mitigation for posting-list skew at 100 TB (one hot
    stopword otherwise sends its whole corpus-sized posting list to a
    single reducer).

    Terms are word bigrams: the synthetic fixture vocabulary is only ~31
    distinct unigrams, which made the round-4 unigram index nearly
    vacuous at the gated SFs (the driver hash-verified a single row);
    bigrams give a ~900-term index with non-trivial postings at every
    SF, and hapax bigrams (df < 3) are dropped as useless postings.

    Two shuffles (df groupBy, then (term, shard) groupBy); the df table
    is vocabulary-sized and broadcasts. Postings are
    sort_array(collect_set(...)) — deterministic regardless of partition
    order — serialized to a comma string for the driver's value hash.
    """
    d = tables(spark, sf_dir)["documents"]
    w = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.array_distinct(
            F.zip_with(
                F.slice(w, 1, F.size(w) - 1),
                F.slice(w, 2, F.size(w) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the token stream feeds TWO consumers (df table, posting build);
    # localCheckpoint materializes the explode once instead of running
    # the tokenize subtree twice (same lineage-truncation discipline as
    # operators/graph.py) — measured 1.1 s -> 0.85 s at sf0.1
    toks = d.select("doc_id", F.explode(bigrams).alias("token")).localCheckpoint(eager=False)
    df_tbl = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))
    n_shards = F.ceil(F.col("df_count") / F.lit(128.0))
    sharded = (
        toks.join(F.broadcast(df_tbl), "token")
        .filter(F.col("df_count") >= 3)
        .withColumn("shard", F.pmod(F.col("doc_id"), n_shards))
    )
    return sharded.groupBy("token", "shard").agg(
        F.max("df_count").alias("df_count"),
        F.count(F.lit(1)).alias("shard_df"),
        F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias("postings"),
    ).select(
        "token",
        F.col("shard").cast("int").alias("shard"),
        "df_count",
        "shard_df",
        "postings",
    )


@query(
    "q_partitioned_pruning",
    oracle="""
    SELECT source, COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS chars
    FROM documents WHERE lang = 'en'
    GROUP BY source
    """,
    tags=("source", "partitioning", "scale"),
)
def q_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning — the single biggest scan lever at
    100 TB: write the corpus partitioned by ``lang``, then aggregate one
    language; the rewritten scan must touch ONLY the lang=en directory
    (PartitionFilters, asserted in tests/test_plans.py), so a 30-language
    corpus reads ~1/30 of its bytes. The oracle aggregates the original
    unpartitioned table — the hash match proves pruning loses nothing.
    """
    from ._util import work_dir

    d = tables(spark, sf_dir)["documents"]
    path = work_dir("part_docs", sf_dir) + "/docs"
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    )


# symmetric per-vector int8 quantization, shared by the two queries below:
# scale = max|x| / 127, q_i = round(x_i / scale). All downstream dot
# products are integer-exact (|q_i| <= 127, dim 64 => |dot| <= ~1e6), so
# the oracle hash cannot drift in float ulps the way float-sum oracles can.
_QUANT_SQL = """
    quant AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
    ),
    q8 AS (
      SELECT vec_id, label, v, scale,
             list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
      FROM quant
    )
"""


def _quantized(e: DataFrame) -> DataFrame:
    """Adds v (double vector), scale, qv (int8-range vector) columns.
    All-zero vectors are dropped (scale would be 0 — dividing yields NaN
    quantized garbage in Spark and an error/NULL in the oracle; a zero
    vector has no direction to search anyway). Same guard in _QUANT_SQL.

    The localCheckpoint between scale and qv is a deliberate optimizer
    BARRIER: ``scale`` appears inside qv's per-element lambda, and
    Catalyst's project collapse inlines the whole
    array_max(transform(...)) subtree into every element evaluation —
    O(dim^2) work per row (the same inlining trap decontaminate hit
    with token arrays). Materializing (v, scale) once makes qv O(dim):
    measured 1.07 s -> 0.6 s for the quantize pass alone at sf0.1,
    compounding through every downstream int8 query."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    out = e.filter(F.col("embedding").isNotNull()).withColumn("v", v)
    scale = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0)
    out = (
        out.withColumn("scale", scale)
        .filter(F.col("scale") > 0)
        .localCheckpoint(eager=False)
    )
    return out.withColumn(
        "qv", F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")).cast("int"))
    )


@query(
    "q_embedding_quantize_int8",
    oracle=f"""
    WITH {_QUANT_SQL}
    SELECT vec_id, round(scale, 6) AS scale6,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_dot_product(qv, qv) AS BIGINT) AS q_norm_sq,
           round(sqrt(list_sum(list_transform(range(1, len(v) + 1),
                 i -> (v[i] - qv[i] * scale) ^ 2))), 6) AS recon_err
    FROM q8
    """,
    tags=("similarity", "quantization", "llm-data"),
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with per-vector scales — the
    4x storage/IO reduction that makes 100 TB embedding search pay for
    itself — plus the reconstruction-error audit a production pipeline
    runs before swapping the fp32 index out.

    Map-side only (no shuffle): every output column derives from the
    row's own vector. Integer summaries (q_sum, q_norm_sq) are exact;
    only the audit error is float-rounded.
    """
    e = _quantized(tables(spark, sf_dir)["embeddings"])
    err_sq = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, q: (x - q * F.col("scale")) * (x - q * F.col("scale"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from ..operators.similarity import dot_col

    return e.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale6"),
        F.aggregate(F.col("qv"), F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("q_sum"),
        dot_col(F.col("qv"), F.col("qv")).cast("bigint").alias("q_norm_sq"),
        F.round(F.sqrt(err_sq), 6).alias("recon_err"),
    )


@query(
    "q_knn_cosine_int8",
    oracle=f"""
    WITH {_QUANT_SQL},
    pairs AS (
      SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
             list_dot_product(qa.qv, ca.qv)
             / (sqrt(list_dot_product(qa.qv, qa.qv)) * sqrt(list_dot_product(ca.qv, ca.qv))) AS cos_raw
      FROM q8 qa JOIN q8 ca ON ca.vec_id != qa.vec_id
      WHERE qa.vec_id < 8
    )
    SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS q_cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
    tags=("similarity", "quantization", "knn", "llm-data"),
)
def q_knn_cosine_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors computed IN the int8-quantized space
    (same shape as q_knn_cosine_bruteforce, which is its fp32 reference
    point): quantized dots are integer-exact, so the oracle hash-matches
    bit-for-bit — the correctness proof that the 4x-compressed index
    returns a faithful ranking. Broadcast queries, zero corpus shuffle.
    """
    from pyspark.sql import Window as W

    from ..operators.similarity import dot_col

    e = _quantized(tables(spark, sf_dir)["embeddings"])
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("c_qv"))
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cos = dot_col(F.col("q_qv"), F.col("c_qv")) / (
        F.sqrt(dot_col(F.col("q_qv"), F.col("q_qv"))) * F.sqrt(dot_col(F.col("c_qv"), F.col("c_qv")))
    )
    pairs = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("q_cosine"))
    )


# NOTE: skew-salted joins live in operators/salted.py (salted_join) and
# are oracle-checked by q_salted_skew_join in extras.py, with the forced
# sort-merge path plan-asserted in tests/test_plans.py.


@query(
    "q_text_unigram_logprob",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_toks FROM freq),
    scored AS (
      SELECT tf.doc_id, tf.token,
             tf.tf * ln(CAST(freq.n AS DOUBLE) / total_toks) AS part,
             tf.tf
      FROM tf JOIN freq USING (token) CROSS JOIN total
    ),
    ranked AS (
      SELECT doc_id, token, part, tf,
             (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY token) - 1) // 256 AS chunk
      FROM scored
    ),
    chunks AS (
      SELECT doc_id, chunk,
             list_sum(list(part ORDER BY token)) AS chunk_sum,
             SUM(tf) AS tf_sum
      FROM ranked GROUP BY doc_id, chunk
    )
    SELECT doc_id, CAST(SUM(tf_sum) AS BIGINT) AS n_tokens,
           round(list_sum(list(chunk_sum ORDER BY chunk)) / SUM(tf_sum), 6) AS avg_logprob,
           (list_sum(list(chunk_sum ORDER BY chunk)) / SUM(tf_sum) >= -9.0) AS keep
    FROM chunks
    GROUP BY doc_id
    """,
    tags=("text", "quality", "llm-data"),
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet/perplexity-filter proxy):
    each document's mean token log-probability under the corpus's own
    unigram distribution. Outlier docs (very negative) are gibberish or
    off-distribution — the classic cheap quality gate before an actual
    LM scorer.

    Determinism: float log-prob parts are summed in a PINNED order on
    both engines, via two-level chunked summation — tokens are ranked
    per doc, grouped into 256-token chunks, each chunk folded in
    token-sorted order, then the chunk partials folded in chunk order.
    Same fold tree on both engines -> bit-identical doubles at the
    6-digit round.

    Memory bound (round 5): no row ever materializes more than one
    256-struct chunk list plus one ~n_tokens/256 partials list, so a
    10M-distinct-token document peaks at ~40k chunk partials instead of
    a single 10M-struct collect_list — the per-row ceiling the round-4
    review flagged is gone. Cost: one extra hash partitioning on
    (doc_id, chunk) between the rank window and the final per-doc agg;
    the vocabulary frequency table still broadcasts.
    """
    from pyspark.sql import Window as W

    d = tables(spark, sf_dir)["documents"]
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total_toks = freq.agg(F.sum("n")).collect()[0][0]  # one scalar, exact
    part = F.col("tf") * F.log(F.col("n").cast("double") / F.lit(float(total_toks)))
    scored = tf.join(F.broadcast(freq), "token").select(
        "doc_id", "token", part.alias("part"), "tf"
    )
    # token is unique per doc after the tf groupBy, so the rank order —
    # and therefore the chunk assignment — is total and engine-portable
    rank = F.row_number().over(W.partitionBy("doc_id").orderBy("token"))
    ranked = scored.withColumn("chunk", F.floor((rank - F.lit(1)) / F.lit(256)))

    def sorted_fold(struct_col, value_field: str):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(struct_col)), lambda s: s[value_field]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    chunks = ranked.groupBy("doc_id", "chunk").agg(
        sorted_fold(F.struct("token", "part"), "part").alias("chunk_sum"),
        F.sum("tf").alias("tf_sum"),
    )
    summed = sorted_fold(F.struct("chunk", "chunk_sum"), "chunk_sum")
    avg = summed / F.sum("tf_sum")
    return chunks.groupBy("doc_id").agg(
        F.sum("tf_sum").alias("n_tokens"),
        F.round(avg, 6).alias("avg_logprob"),
        (avg >= -9.0).alias("keep"),
    )


@query(
    "q_salted_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("aggregation", "skew", "scale"),
)
def q_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted COUNT(DISTINCT): phase 1 groups on
    (key, salt(user)) and collects per-salt distinct counts after an
    in-partition dedup, phase 2 sums the per-salt counts — correct
    because the salt is a function of the distinct-target itself, so
    each distinct user lands in exactly one salt bucket.

    This is the manual mitigation for distinct-aggregation skew that
    AQE cannot touch (one hot GROUP key whose distinct set is huge:
    Spark's expand-based distinct sends every row of that key to one
    reducer; salting fans it out SALT ways). Oracle = the plain
    COUNT(DISTINCT), proving the decomposition is semantically
    invisible. n_events rides along summed from phase 1.
    """
    ev = tables(spark, sf_dir)["events"]
    salt_n = 16
    phase1 = (
        ev.withColumn("_salt", F.pmod(F.xxhash64(F.col("user_id")), F.lit(salt_n)))
        .groupBy("event_type", "_salt")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.count(F.lit(1)).alias("ne"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("nd").alias("n_users"), F.sum("ne").alias("n_events")
    )


@query(
    "q_schema_evolution_merge",
    oracle="""
    WITH v1 AS (SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0),
    v2 AS (SELECT event_id, event_type, value, user_id FROM events WHERE event_id % 2 = 1)
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_old_schema,
           COUNT(user_id) AS n_with_user
    FROM (SELECT event_id, event_type, value, NULL AS user_id FROM v1
          UNION ALL SELECT * FROM v2)
    GROUP BY event_type
    """,
    tags=("source", "schema-evolution", "format"),
)
def q_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: generation 1 files lack the ``user_id``
    column, generation 2 files carry it; one mergeSchema read unifies
    them with NULL backfill for the old files — the append-only column
    addition every long-lived 100 TB table eventually needs, verified
    lossless against the oracle's explicit UNION.

    (mergeSchema costs a footer pass per file at planning time — on a
    real table it is set once via the table schema, not per query; the
    per-file merge here is the correctness demonstration.)
    """
    from ._util import work_dir

    ev = tables(spark, sf_dir)["events"]
    base = work_dir("schemaevo", sf_dir) + "/table"
    ev.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).parquet(base + "/gen=1")
    ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", "value", "user_id"
    ).write.mode("overwrite").parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("bigint")).alias("n_old_schema"),
        F.count("user_id").alias("n_with_user"),
    )

"""Round-7 operator batch 5: distributed-scan statistics, privacy
auditing, lakehouse position deletes, ranking eval, readability, and
the IDENTIFIER dynamic-name surface.

The headline structural addition is ``operators/scan.py`` — a
distributed inclusive prefix sum (parallel scan) built on the same
two-phase range-partition trick as ``operators/ranks.py``. The two
nonparametric tests here (Kolmogorov–Smirnov, Mann–Whitney U) are its
consumers: both reduce to ECDF/rank-sum arithmetic over a cumulative
histogram, which the classic ``SUM() OVER (ORDER BY v)`` form would put
on a single partition. Every statistic is carried as exact integer
parts (cross-multiplied numerators), so the oracle hash is bit-exact
with no float-summation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scan import with_running_totals
from ..operators.similarity import knn_bruteforce
from ..tables import tables
from .registry import query
from .similarity import COSINE_SQL


def _two_sample_hist(spark: SparkSession, sf_dir: str, type_a: str, type_b: str) -> DataFrame:
    """Per-distinct-value counts of events.value for two event types:
    (value, c1, c2) — the shared input of both nonparametric tests."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_type").isin(type_a, type_b))
    return ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == type_a, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == type_b, 1).otherwise(0)).alias("c2"),
    )


@query(
    "q_ks_two_sample",
    oracle="""
    WITH hist AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c2
      FROM events WHERE event_type IN ('click', 'error') GROUP BY value
    ),
    scan AS (
      SELECT CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS cum_c1,
             CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS cum_c2
      FROM hist
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM hist)
    SELECT t.n1, t.n2,
           CAST(MAX(ABS(s.cum_c1 * t.n2 - s.cum_c2 * t.n1)) AS BIGINT) AS ks_num,
           CAST(MAX(ABS(s.cum_c1 * t.n2 - s.cum_c2 * t.n1)) * 1000000 // (t.n1 * t.n2) AS BIGINT)
             AS ks_scaled_1e6
    FROM scan s, tot t GROUP BY t.n1, t.n2
    """,
    tags=("stats", "drift", "scan", "round7"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the 'click' and
    'error' value distributions — the standard numeric-feature drift
    test next to q_corpus_drift_kl's categorical KL. Exact rational
    arithmetic: D = ks_num / (n1*n2) where ks_num = max over pooled
    distinct values of |cum1*n2 - cum2*n1| (integer cross-multiplied
    ECDF gap), so no float ever enters the hash.

    Scale shape: the ECDF is a distributed prefix scan
    (operators/scan.py) over the per-value histogram — range exchange +
    per-partition window + driver-side prefix of |partitions| totals;
    no single-partition ``SUM() OVER (ORDER BY value)`` anywhere. The
    histogram groupBy bounds scan input by distinct-value cardinality."""
    hist = _two_sample_hist(spark, sf_dir, "click", "error")
    scanned = with_running_totals(hist, ["value"], ["c1", "c2"])
    tot = hist.agg(
        F.sum("c1").cast("bigint").alias("n1"), F.sum("c2").cast("bigint").alias("n2")
    )
    gap = F.abs(F.col("cum_c1") * F.col("n2") - F.col("cum_c2") * F.col("n1"))
    return (
        scanned.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(gap).cast("bigint").alias("ks_num"))
        .select(
            "n1",
            "n2",
            "ks_num",
            F.expr("ks_num * 1000000 DIV (n1 * n2)").cast("bigint").alias("ks_scaled_1e6"),
        )
    )


@query(
    "q_mannwhitney_u",
    oracle="""
    WITH hist AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value
    ),
    scan AS (
      SELECT c1, c2, c1 + c2 AS t,
             CAST(SUM(c1 + c2) OVER (ORDER BY value) AS BIGINT) AS cum_t
      FROM hist
    ),
    agg AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cum_t - t + 1)) AS BIGINT) AS two_r1,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
      FROM scan
    )
    SELECT n1, n2,
           CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
           CAST(2 * n1 * n2 - (two_r1 - n1 * (n1 + 1)) AS BIGINT) AS two_u2,
           tie_term
    FROM agg
    """,
    tags=("stats", "rank-sum", "scan", "round7"),
)
def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between the 'click' and 'purchase'
    value distributions, with the tie-correction term — the standard
    nonparametric A/B comparison (did purchases shift the value
    distribution?). Everything stays integer: midranks are carried
    doubled (2*midrank = 2*cnt_less + cnt_eq + 1, always integral), so
    two_u1 = 2*U1 exactly; the invariant two_u1 + two_u2 == 2*n1*n2 is
    pinned in pytest. tie_term = sum(t^3 - t) feeds the variance
    correction downstream.

    Scale shape: identical to q_ks_two_sample — one histogram groupBy,
    one distributed prefix scan, one bounded aggregate."""
    hist = _two_sample_hist(spark, sf_dir, "click", "purchase").withColumn(
        "t", F.col("c1") + F.col("c2")
    )
    scanned = with_running_totals(hist, ["value"], ["t"])
    agg = scanned.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_t") - F.col("t") + 1)).cast("bigint").alias("two_r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast("bigint").alias("tie_term"),
    )
    return agg.select(
        "n1",
        "n2",
        (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("bigint").alias("two_u1"),
        (2 * F.col("n1") * F.col("n2") - (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)))
        .cast("bigint")
        .alias("two_u2"),
        "tie_term",
    )


@query(
    "q_crosscorr_lag",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2
    ),
    x AS (SELECT d, n AS x FROM daily WHERE event_type = 'view'),
    y AS (SELECT d, n AS y FROM daily WHERE event_type = 'purchase'),
    j AS (
      SELECT CAST(l.lag AS BIGINT) AS lag, x.x, y.y
      FROM x CROSS JOIN range(0, 7) l(lag)
      JOIN y ON y.d = x.d + INTERVAL (l.lag) DAY
    )
    SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS num,
           CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS denx,
           CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT) AS deny
    FROM j GROUP BY lag
    """,
    tags=("timeseries", "crosscorr", "round7"),
)
def q_crosscorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily 'view' and 'purchase' count
    series at lags 0..6 ("do views lead purchases, and by how many
    days?"). Per lag the Pearson numerator/denominator parts are emitted
    as exact integers (n*Sxy - Sx*Sy etc.) — r(lag) = num/sqrt(denx*deny)
    is one downstream float the caller derives; the hashed result has
    none.

    Scale shape: the daily rollup is one groupBy; the lag fan-out is an
    exploded 7-element literal (no cartesian join); the shifted match is
    an equi-join on the lagged date. Day-grain series are tiny relative
    to the event data regardless of SF."""
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_type").isin("view", "purchase"))
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    x = daily.filter(F.col("event_type") == "view").select("d", F.col("n").alias("x"))
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("dy"), F.col("n").alias("y")
    )
    lagged = (
        x.withColumn("lag", F.explode(F.array(*[F.lit(i) for i in range(7)])))
        .withColumn("lag", F.col("lag").cast("bigint"))
        .withColumn("d_shift", F.date_add(F.col("d"), F.col("lag").cast("int")))
    )
    j = lagged.join(y, F.col("dy") == F.col("d_shift"))
    n = F.count(F.lit(1))
    return (
        j.groupBy("lag")
        .agg(
            n.cast("bigint").alias("n_days"),
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            .cast("bigint")
            .alias("num"),
            (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
            .cast("bigint")
            .alias("denx"),
            (n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
            .cast("bigint")
            .alias("deny"),
        )
    )


@query(
    "q_k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT)
             AS l_diversity,
           CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS INT) AS at_risk
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
    tags=("privacy", "k-anonymity", "round7"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier pair
    (nation, market segment): every equivalence class with its size,
    the diversity of the sensitive attribute (account-balance band,
    2000-wide), and an at-risk flag for classes below k=5 — the
    re-identification pre-check a privacy reviewer runs before a table
    leaves the trust boundary (complements q_text_redact_pii's
    content-level scrub and q_gdpr_delete_propagation's erasure).

    Scale shape: one groupBy on the QI columns; COUNT(DISTINCT band) is
    a two-phase partial aggregate. Class count is bounded by the QI
    domain (|nations| x |segments|), not data size."""
    c = tables(spark, sf_dir)["customer"]
    band = F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("bigint")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct(band).cast("bigint").alias("l_diversity"),
        F.when(F.count(F.lit(1)) < 5, 1).otherwise(0).cast("int").alias("at_risk"),
    )


@query(
    "q_merge_on_read_deletion_vectors",
    oracle="""
    WITH base AS (
      SELECT l_linestatus, l_returnflag, l_quantity, l_extendedprice,
             l_orderkey % 8 AS file_id,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey % 8
                                ORDER BY l_orderkey, l_linenumber, l_partkey,
                                         l_suppkey, l_quantity, l_extendedprice,
                                         l_discount, l_tax, l_returnflag,
                                         l_linestatus, l_shipdate) AS pos
      FROM lineitem
    ),
    dv AS (
      SELECT file_id, pos FROM base WHERE l_returnflag = 'R' AND l_quantity < 10
      UNION
      SELECT file_id, pos FROM base WHERE pos % 1000 = 0
    )
    SELECT b.l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(b.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM dv WHERE dv.file_id = b.file_id AND dv.pos = b.pos)
    GROUP BY b.l_linestatus
    """,
    tags=("lakehouse", "deletion-vectors", "round7"),
)
def q_merge_on_read_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read with position deletes (Iceberg v2 deletion-vector
    read path): rows live in immutable "files" (file_id = orderkey % 8,
    pos = row number within the file's sort order); deletes are stored
    separately as (file_id, pos) pairs — one predicate-derived delete
    file plus one position-only delete file — and applied at read time
    via ANTI JOIN, never by rewriting data files. Complements
    q_snapshot_time_travel (copy-on-write) and q_cdc_snapshot_diff:
    this is the third lakehouse mutation strategy, the one with O(1)
    write amplification.

    Scale shape: pos is a window partitioned by file_id (parallel
    across files, as in a real table where positions are per-file);
    the delete application is a key-partitioned anti join on
    (file_id, pos) with the small delete side broadcastable."""
    li = tables(spark, sf_dir)["lineitem"]
    # (l_orderkey, l_linenumber) is NOT unique in this fixture (11k+ dup
    # pairs), so pos orders by ALL columns: the order is then total up to
    # fully-identical rows, whose interchangeable pos assignment cannot
    # change any observable result.
    order_cols = [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]
    base = li.withColumn("file_id", F.expr("l_orderkey % 8")).withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("file_id").orderBy(*order_cols)),
    )
    dv = (
        base.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10))
        .select("file_id", "pos")
        .union(base.filter(F.col("pos") % 1000 == 0).select("file_id", "pos"))
        .distinct()
    )
    surviving = base.join(dv, ["file_id", "pos"], "left_anti")
    return surviving.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


@query(
    "q_ndcg_ranking_eval",
    oracle=f"""
    WITH pairs AS (
      SELECT qa.vec_id AS query_id, qa.label AS qlabel,
             ca.vec_id AS neighbor_id, ca.label AS nlabel,
             {COSINE_SQL} AS cos_raw
      FROM embeddings qa JOIN embeddings ca ON ca.vec_id != qa.vec_id
      WHERE qa.vec_id < 5
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_raw DESC, neighbor_id) AS rank
        FROM pairs
      ) WHERE rank <= 10
    ),
    dcg AS (
      SELECT query_id,
             CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
             CAST(SUM(CASE WHEN nlabel = qlabel
                      THEN CAST(FLOOR(1000000.0 / log2(rank + 1)) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS dcg_q
      FROM topk GROUP BY query_id
    ),
    nrel AS (
      SELECT q.vec_id AS query_id, LEAST(10, COUNT(*)) AS m
      FROM embeddings q JOIN embeddings c ON c.label = q.label AND c.vec_id != q.vec_id
      WHERE q.vec_id < 5 GROUP BY 1
    ),
    idcg AS (
      SELECT n.query_id, CAST(n.m AS BIGINT) AS m,
             CAST(SUM(CAST(FLOOR(1000000.0 / log2(r.rank + 1)) AS BIGINT)) AS BIGINT) AS idcg_q
      FROM nrel n JOIN range(1, 11) r(rank) ON r.rank <= n.m GROUP BY 1, 2
    )
    SELECT d.query_id, d.n_rel_at_k, i.m, d.dcg_q, i.idcg_q
    FROM dcg d JOIN idcg i ON i.query_id = d.query_id
    """,
    tags=("similarity", "ranking-eval", "round7"),
)
def q_ndcg_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 for the brute-force cosine retriever with same-label as
    the relevance oracle — the ranking-quality metric that certifies an
    ANN index (compare the IVF/LSH tiers' result against this exact
    retriever's nDCG, not just recall). Gains are quantized integers
    (floor(1e6/log2(rank+1)), identical expression both engines), so
    DCG and ideal DCG hash exactly; nDCG = dcg_q/idcg_q is the one
    downstream float left to the caller.

    Scale shape: reuses the broadcast-queries/stream-corpus-once
    brute-force plan (operators/similarity.py); the IDCG side is a
    constant 10-row broadcast gain table theta-joined to one row per
    query."""
    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", F.col("label").alias("qlabel")
    )
    nn = knn_bruteforce(e, q.select("query_id", "embedding"), k=10)
    labeled = nn.join(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")),
        "neighbor_id",
    ).join(F.broadcast(q.select("query_id", "qlabel")), "query_id")
    rel = F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
    gain = F.floor(F.lit(1000000.0) / F.log2(F.col("rank") + F.lit(1))).cast("bigint")
    dcg = labeled.groupBy("query_id").agg(
        F.sum(rel).cast("bigint").alias("n_rel_at_k"),
        F.sum(rel * gain).cast("bigint").alias("dcg_q"),
    )
    label_sizes = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    nrel = (
        q.join(F.broadcast(label_sizes), F.col("qlabel") == F.col("label"))
        .select("query_id", F.least(F.lit(10), F.col("n_label") - 1).alias("m"))
    )
    gains = (
        spark.range(1, 11)
        .select(F.col("id").alias("irank"))
        .withColumn(
            "g", F.floor(F.lit(1000000.0) / F.log2(F.col("irank") + F.lit(1))).cast("bigint")
        )
    )
    idcg = (
        nrel.join(F.broadcast(gains), F.col("irank") <= F.col("m"))
        .groupBy("query_id", F.col("m").cast("bigint").alias("m"))
        .agg(F.sum("g").cast("bigint").alias("idcg_q"))
    )
    return dcg.join(idcg, "query_id").select("query_id", "n_rel_at_k", "m", "dcg_q", "idcg_q")


@query(
    "q_text_readability",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             COALESCE(len(regexp_extract_all(lower(text), '[a-z]+')), 0) AS n_words,
             GREATEST(1, len(regexp_extract_all(text, '[.!?]'))) AS n_sent,
             COALESCE(list_sum(list_transform(
               regexp_extract_all(lower(text), '[a-z]+'),
               w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0) AS n_syll
      FROM documents
    ),
    agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             GREATEST(1, CAST(SUM(n_words) AS BIGINT)) AS words,
             CAST(SUM(n_sent) AS BIGINT) AS sentences,
             GREATEST(1, CAST(SUM(n_syll) AS BIGINT)) AS syllables
      FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs, words, sentences, syllables,
           CAST(FLOOR(1000.0 * (206.835
                - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))))
             AS BIGINT) AS flesch_q
    FROM agg
    """,
    tags=("text", "quality", "round7"),
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Flesch reading-ease profile: word, sentence, and
    syllable censuses (syllables = vowel-group runs per word, the
    classic heuristic) and the quantized Flesch score
    206.835 - 1.015*(W/S) - 84.6*(Syl/W) — the readability axis of the
    quality-scoring tier next to q_text_quality_score's length/ratio
    axes. Integer censuses aggregate exactly; the score is a fixed
    three-term double expression over them, written identically in both
    engines, floored at x1000.

    Scale shape: syllable counting is a JVM-side higher-order fold
    (transform + aggregate over the word array) — no explode, no
    Python; then one groupBy on lang."""
    d = tables(spark, sf_dir)["documents"]
    per_doc = d.select(
        "lang",
        F.expr("coalesce(size(regexp_extract_all(lower(text), '[a-z]+', 0)), 0)").alias(
            "n_words"
        ),
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]', 0)))").alias("n_sent"),
        F.expr(
            "aggregate(transform(regexp_extract_all(lower(text), '[a-z]+', 0), "
            "w -> greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0)))), "
            "0L, (a, x) -> a + x)"
        ).alias("n_syll"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.greatest(F.lit(1), F.sum("n_words")).cast("bigint").alias("words"),
        F.sum("n_sent").cast("bigint").alias("sentences"),
        F.greatest(F.lit(1), F.sum("n_syll")).cast("bigint").alias("syllables"),
    )
    flesch = F.floor(
        F.lit(1000.0)
        * (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences").cast("double"))
            - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words").cast("double"))
        )
    ).cast("bigint")
    return agg.select("lang", "n_docs", "words", "sentences", "syllables", flesch.alias("flesch_q"))


@query(
    "q_identifier_clause",
    oracle="""
    SELECT l_shipdate, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_shipdate ORDER BY l_shipdate LIMIT 10
    """,
    tags=("sql-surface", "dynamic-sql", "round7"),
)
def q_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER clause (Spark 4): a table name supplied as a BOUND
    PARAMETER resolved through IDENTIFIER(:tab) — dynamic object names
    without string-spliced SQL, completing the dynamic-SQL pair with
    q_execute_immediate (which binds values; this binds names; both
    keep the parse tree injection-proof). The oracle is the same query
    with the name written literally."""
    tables(spark, sf_dir)["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_shipdate, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM IDENTIFIER(:tab)
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_shipdate ORDER BY l_shipdate LIMIT 10
        """,
        args={"tab": "lineitem"},
    )

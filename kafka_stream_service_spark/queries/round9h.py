"""Round-9 operator batch 8: trigram LIKE-acceleration index and
anti-entropy table fingerprints.

Family placement: the trigram index is the pg_trgm recipe — answer
%substring% predicates from character-trigram posting lists
(intersection -> candidates -> exact verify) instead of a full scan —
joining q_inverted_index (word grain) and q_zonemap_pruning_audit in
the "engine internals as queries" tier. The table fingerprint is the
Merkle-style anti-entropy digest (Dynamo/Cassandra repair shape): an
order-insensitive per-bucket hash so two replicas can find divergent
key ranges by comparing tens of digests instead of re-shipping rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .dedup2 import _h_sql, portable_hash64
from .registry import query

# ---------------------------------------------------------------------------
# Trigram LIKE-acceleration (pg_trgm style)
# ---------------------------------------------------------------------------

_LIKE_PATTERNS = ("slow fast", "agg row scan", "the customer")


def _pattern_grams(p: str) -> list[str]:
    return sorted({p[i : i + 3] for i in range(len(p) - 2)})


@query(
    "q_trigram_like_index",
    oracle=f"""
    WITH grams AS (  -- distinct char trigrams per doc (the posting lists)
      SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
      FROM documents, unnest(range(1, length(text) - 1)) AS u(i)
    ),
    pats AS (
      {" UNION ALL ".join(
        "SELECT " + repr(p) + " AS pattern, " + repr(g) + " AS g"
        for p in _LIKE_PATTERNS for g in _pattern_grams(p)
      )}
    ),
    need AS (SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_need FROM pats GROUP BY 1),
    cand AS (  -- docs containing ALL of a pattern's trigrams
      SELECT p.pattern, g.doc_id
      FROM pats p JOIN grams g ON g.g = p.g
      GROUP BY p.pattern, g.doc_id
      HAVING COUNT(*) = (SELECT n_need FROM need WHERE need.pattern = p.pattern)
    ),
    verified AS (
      SELECT c.pattern,
             CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN d.text LIKE '%' || c.pattern || '%'
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
      FROM cand c JOIN documents d ON d.doc_id = c.doc_id
      GROUP BY c.pattern
    ),
    truth AS (
      SELECT p.pattern, CAST(COUNT(d.text) AS BIGINT) AS n_like_scan
      FROM (SELECT DISTINCT pattern FROM pats) p
      LEFT JOIN documents d ON d.text LIKE '%' || p.pattern || '%'
      GROUP BY p.pattern
    )
    SELECT t.pattern, v.n_candidates, v.n_matches, t.n_like_scan
    FROM truth t JOIN verified v ON v.pattern = t.pattern
    """,
    tags=("text", "index", "engine-internals", "round9"),
)
def q_trigram_like_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-predicate acceleration via character-trigram posting
    lists (the pg_trgm recipe): every %pattern% predicate is answered by
    intersecting the posting lists of the pattern's trigrams (a doc must
    contain ALL of them to possibly match), then exact-verifying only
    the candidates — at 100 TB the difference between a full-corpus
    regex scan and touching a few posting lists + candidate rows. The
    query emits, per pattern, the candidate count, the verified match
    count, and the ground-truth LIKE-scan count; n_matches ==
    n_like_scan is the index's correctness invariant (no false
    negatives: a matching doc contains every trigram of the pattern by
    construction), and n_candidates - n_matches is the false-positive
    overhead the verify step pays.

    Exactness: pure set algebra and integer counts.

    Scale shape: the posting build is one explode + distinct (the
    inverted-index shape, done once and amortized across all queries);
    per pattern the probe touches only its trigrams' posting rows
    (broadcast of the tiny pattern-gram table) and the verify scans only
    candidate docs.
    """
    from ..operators.ranks import cpu_fanout

    d = tables(spark, sf_dir)["documents"]
    # Fan the posting build to cluster width (optimization r15, guide
    # §2.5): the trigram explode + distinct partial-aggregate ran as ONE
    # task over the single-file fixture scan (2.4 of this row's 3.6 s,
    # stage profile); cpu_fanout is a no-op at production scan widths.
    grams = (
        cpu_fanout(d.select(F.col("text").alias("t"), "doc_id"))
        .select(
            "doc_id",
            F.explode(
                # Guard length >= 3: Spark's sequence(1, 0) counts DOWN
                # (emitting spurious sub-3-char grams) where DuckDB's
                # range() is empty — same trap round9b/round9c CASE-guard.
                F.expr(
                    "CASE WHEN length(t) >= 3 THEN "
                    "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) "
                    "ELSE array() END"
                )
            ).alias("g"),
        )
        .distinct()
    )
    pat_rows = [
        F.struct(F.lit(p).alias("pattern"), F.lit(g).alias("g"))
        for p in _LIKE_PATTERNS
        for g in _pattern_grams(p)
    ]
    pats = (
        spark.range(1)
        .select(F.explode(F.array(*pat_rows)).alias("r"))
        .select("r.pattern", "r.g")
    )
    need = pats.groupBy("pattern").agg(F.count(F.lit(1)).cast("bigint").alias("n_need"))
    cand = (
        pats.join(grams, "g")
        .groupBy("pattern", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_have"))
        .join(F.broadcast(need), "pattern")
        .filter(F.col("n_have") == F.col("n_need"))
        .select("pattern", "doc_id")
    )
    verified = (
        cand.join(d.select("doc_id", "text"), "doc_id")
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(
                F.when(
                    F.expr("text LIKE '%' || pattern || '%'"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matches"),
        )
    )
    truth = (
        pats.select("pattern")
        .distinct()
        .join(d.select("text"), F.expr("text LIKE '%' || pattern || '%'"), "left")
        .groupBy("pattern")
        .agg(F.count("text").cast("bigint").alias("n_like_scan"))
    )
    return truth.join(verified, "pattern").select(
        "pattern", "n_candidates", "n_matches", "n_like_scan"
    )


# ---------------------------------------------------------------------------
# Anti-entropy table fingerprint (Merkle-style bucket digests)
# ---------------------------------------------------------------------------

_FP_BUCKETS = 64


@query(
    "q_table_fingerprint",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey % {_FP_BUCKETS} AS bucket,
             {_h_sql(
                 "o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' "
                 "|| CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)",
                 "5",
             )} AS hv
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(hv AS HUGEINT)) AS VARCHAR) AS digest
    FROM h GROUP BY bucket
    """,
    tags=("storage", "integrity", "anti-entropy", "round9"),
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table fingerprint (the Dynamo/Cassandra repair
    shape): every row is hashed canonically (portable 60-bit hash of a
    '|'-joined canonical projection), rows are assigned to
    {_FP_BUCKETS} key buckets, and each bucket emits an
    ORDER-INSENSITIVE digest (row count + exact wide-integer hash sum).
    Two replicas compare the 64 digests; only buckets that differ need
    row-level reconciliation — a 64-row exchange replaces re-shipping
    the table. Commutative sums make the digest independent of
    partitioning, ordering, and merge history, which is exactly why
    real anti-entropy uses them.

    Exactness: the digest is an exact HUGEINT/DECIMAL(38,0) sum of
    60-bit hashes (never overflows under ~1e19 rows per bucket),
    serialized as a string because the driver compare canonicalizes
    int128 and decimal differently.

    Scale shape: one scan, map-side-combinable 64-key aggregation — the
    cheapest possible whole-table integrity check; bucket count scales
    with the desired repair granularity, not data.
    """
    o = tables(spark, sf_dir)["orders"]
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
    )
    h = o.select(
        (F.col("o_orderkey") % _FP_BUCKETS).cast("bigint").alias("bucket"),
        portable_hash64(canon, 5).alias("hv"),
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("hv").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("digest"),
    )

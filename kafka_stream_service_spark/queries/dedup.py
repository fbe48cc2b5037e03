"""Deduplication operators for large-scale training-data pipelines.

Four tiers, each with its 100 TB story:

- exact content-hash dedup: one shuffle on sha256(text) — the content hash
  distributes uniformly, so no skew; at scale the hash is the shuffle key
  and the doc bodies never move twice.
- keyed "keep first" dedup: window row_number over the dedup key — the
  deterministic form of dropDuplicates.
- n-gram Jaccard verification: exact pair similarity via a shared-shingle
  equi-join; bounded here to a candidate block, because all-pairs is
  quadratic — at scale this *only* runs on LSH candidate pairs.
- MinHash LSH: shingle -> K minhashes (xxhash64 with per-row seeds) -> band
  buckets -> candidate pairs via equi-join on (band, signature) -> exact
  Jaccard verify. Fully distributed: the only shuffles are the band-bucket
  groupBy and the verify join; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

# --- shared shingle helpers -------------------------------------------------

SHINGLES_SQL = """
  list_distinct(list_transform(
    range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
  ))
"""


@query(
    "q_dedup_exact_hash",
    oracle="""
    SELECT content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id, sha256(text) AS content_hash FROM documents)
    GROUP BY content_hash
    """,
    tags=("dedup", "llm-data"),
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: canonical doc per sha256(text)."""
    d = tables(spark, sf_dir)["documents"]
    return (
        d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id IS NOT NULL
    ) WHERE rn = 1
    """,
    tags=("dedup", "llm-data"),
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the lowest doc_id per (lang, source) — the
    deterministic form of dropDuplicates([...]).

    NULL doc_id rows are excluded up front (both sides): a document
    without an identity cannot be a canonical keep, and leaving it in
    would make the pick engine-defined (Spark sorts NULLS FIRST
    ascending, DuckDB NULLS LAST — the adversarial-fixture tier caught
    exactly this divergence)."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id").isNotNull())
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {SHINGLES_SQL} AS shingles
      FROM documents WHERE doc_id < 300
    ), exploded AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), pair_common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) /
                 (len(sa.shingles) + len(sb.shingles) - n_common), 6) AS jaccard
    FROM pair_common
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - n_common) >= 0.2
    """,
    tags=("dedup", "similarity", "llm-data"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity for a bounded candidate block.

    Shared-shingle equi-join + group count = |A ∩ B|; |A ∪ B| from the
    per-doc distinct shingle counts. The block filter stands in for LSH
    candidate generation (see q_dedup_minhash_lsh) — running this all-pairs
    at 100 TB would be quadratic. The doc_id < 300 block contains the
    fixture's planted near-dup pairs, so the sf0.01 result is non-empty
    (7 pairs, J 0.95+) — a broken-but-empty query cannot pass.
    """
    from ..operators.dedup import word_shingles_from_tokens

    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 300)
    # project the token array first — inlining split() into the shingle
    # lambda re-splits the text per element (see word_shingles_from_tokens)
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    sh = t.select("doc_id", word_shingles_from_tokens(F.col("toks"), 3).alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "q_dedup_minhash_lsh",
    oracle=None,  # xxhash64 has no DuckDB equivalent — driver rows-only check
    tags=("dedup", "lsh", "llm-data"),
    portable_twin="q_minhash_lsh_portable",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    hashed shingles (int64) -> 16 minhashes -> 4 bands -> band-bucket
    self-join over (doc_id, band, bucket) ONLY -> candidate pairs -> exact
    Jaccard >= 0.1 on the re-joined shingle sets. Deterministic (xxhash64,
    fixed seeds); shingle arrays never enter the band-join shuffle (see
    operators/dedup.py scale notes).
    """
    from ..operators import lsh_candidate_pairs, minhash_frame
    from ..operators.dedup import jaccard

    d = tables(spark, sf_dir)["documents"]
    # one Arrow pass computes shingle sets AND minhash signatures;
    # persisted because both the band join and the exact-verify rejoin
    # read it
    sh = minhash_frame(d, n=3, k=16).filter(F.size("shingles") > 0).persist()
    cand = lsh_candidate_pairs(
        sh, id_col="doc_id", shingle_col="shingles", k=16, bands=4, sig_col="sig"
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q_dedup_simhash",
    oracle=None,  # xxhash64-based — driver rows-only check
    tags=("dedup", "simhash", "llm-data"),
    portable_twin="q_simhash_portable",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document + a 16-bit blocking bucket.

    Vectorized numpy bit votes in one Arrow pass
    (operators/dedup.py:simhash_frame); the pure-JVM ``simhash64``
    formulation exists for expression-only contexts.
    """
    from ..operators.dedup import simhash_frame

    d = tables(spark, sf_dir)["documents"]
    return (
        simhash_frame(d)
        .withColumn("bucket", F.shiftrightunsigned("simhash", 48))
        .orderBy("doc_id")
    )


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS k
      FROM documents
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                   ORDER BY n_chars DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT k AS prefix_key,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
           CAST(MIN(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS keep_chars,
           CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dropped
    FROM ranked GROUP BY k
    """,
    tags=("dedup", "curation", "llm-data"),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-RANKED dedup (keep-BEST, not keep-first): documents
    sharing the same 5-token opening are treated as variants of one
    underlying document (the truncation / boilerplate-wrapper dedup
    shape — same opening, different amounts of surviving body), and the
    LONGEST variant wins (n_chars desc, doc_id tie-break). Keep-first
    (q_dedup_keep_first) answers "which arrived first"; keep-best
    answers "which copy should train" — the semantic production
    pipelines actually want when near-identical variants differ in
    completeness. Per retained doc the audit also accounts the
    character mass dropped with the losing variants.

    Scale shape: one window partitioned by the prefix key (computed
    map-side from the first 5 tokens only — the full text never keys a
    shuffle), then a per-key fold; identical to keep-first's cost. For
    fuzzier variant groups swap the key for a MinHash band — the
    ranking logic is key-agnostic.
    """
    d = tables(spark, sf_dir)["documents"]
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("k"),
    )
    w = W.partitionBy("k").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ranked = keyed.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(F.col("k").alias("prefix_key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("bigint").alias("keep_doc_id"),
        F.min(F.when(F.col("rn") == 1, F.col("n_chars"))).cast("bigint").alias("keep_chars"),
        F.coalesce(
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars"))), F.lit(0)
        ).cast("bigint").alias("chars_dropped"),
    )

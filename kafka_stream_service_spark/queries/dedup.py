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


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _word_shingles(n: int = 3, col: str = "text") -> F.Column:
    """Distinct word n-gram shingles as array<string> (built-in exprs only)."""
    toks = _tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


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
      FROM documents
    ) WHERE rn = 1
    """,
    tags=("dedup", "llm-data"),
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the lowest doc_id per (lang, source) — the
    deterministic form of dropDuplicates([...])."""
    d = tables(spark, sf_dir)["documents"]
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
      FROM documents WHERE source = 'src0' AND doc_id < 200
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
    at 100 TB would be quadratic.
    """
    d = tables(spark, sf_dir)["documents"].filter(
        (F.col("source") == "src0") & (F.col("doc_id") < 200)
    )
    sh = d.select("doc_id", _word_shingles(3).alias("shingles"))
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


# MinHash parameters: 16 hashes = 4 bands x 4 rows. xxhash64 is a Spark
# built-in (JVM-side, no Python): h_i(s) = xxhash64(s, seed=i).
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4  # K / BANDS


def minhash_signature(shingles: F.Column) -> F.Column:
    """array<long> of MINHASH_K min-hashes over the shingle set."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(MINHASH_K)
        ]
    )


@query(
    "q_dedup_minhash_lsh",
    oracle=None,  # xxhash64 has no DuckDB equivalent — driver rows-only check
    tags=("dedup", "lsh", "llm-data"),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    shingle -> 16 minhashes -> 4 bands of 4 -> groupBy band bucket ->
    candidate pairs -> exact Jaccard >= 0.1 verify. Every stage is a
    DataFrame op; deterministic (xxhash64 fixed seeds). At 100 TB the band
    join is the only quadratic-risk stage and is bounded by bucket size;
    hot buckets (boilerplate docs) get salted or capped in practice.
    """
    d = tables(spark, sf_dir)["documents"]
    sh = d.select("doc_id", _word_shingles(3).alias("shingles")).filter(F.size("shingles") > 0)
    sig = sh.select("doc_id", "shingles", minhash_signature(F.col("shingles")).alias("sig"))

    bands = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * MINHASH_ROWS + r + 1).cast("string")
                                for r in range(MINHASH_ROWS)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return cand.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= 0.1
    ).orderBy("doc_a", "doc_b")


@query(
    "q_dedup_simhash",
    oracle=None,  # xxhash64-based — driver rows-only check
    tags=("dedup", "simhash", "llm-data"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document + bucket sizes.

    Each token hashes to 64 bits (xxhash64); the fingerprint takes the sign
    of the per-bit vote sum. Buckets on the top 16 bits give the blocking
    key used for near-dup candidate generation at scale. Pure built-in
    expressions — the bit loop unrolls into the plan once, row-parallel.
    """
    d = tables(spark, sf_dir)["documents"]
    toks = F.array_distinct(_tokens())
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # vote for bit i: sum over tokens of (bit set ? 1 : -1); bit i of
    # fingerprint = vote > 0
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    fingerprint = None
    for i, vote in enumerate(bit_votes):
        bit = F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint.bitwiseOR(bit)
    return (
        d.select("doc_id", fingerprint.alias("simhash"))
        .withColumn("bucket", F.shiftrightunsigned("simhash", 48))
        .orderBy("doc_id")
    )

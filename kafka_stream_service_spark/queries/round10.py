"""Round-10 operator batch 1: exact-substring dedup (ExactSubstr).

Family placement: the one canonical LLM-dedup family the catalog lacked
(VERDICT r9 #2) — Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better", the ExactSubstr recipe: find every >= k-token
span that occurs more than once ANYWHERE in the corpus and emit a
span-removal manifest per document. Complements the existing whole-doc
(exact hash) and near-doc (MinHash/SimHash/embedding) tiers: those
decide keep/drop per document; ExactSubstr removes REPEATED REGIONS
from documents that are otherwise unique (boilerplate, licenses, quoted
chunks) — the dominant duplication mode in web crawls.

The distributed recipe (suffix arrays are the paper's single-machine
tool; the shingle-grain equivalent is the cluster-native one):
  1. k-token shingles WITH POSITION — (doc_id, pos, shingle) rows;
  2. duplicated shingle TYPES = corpus-wide count >= 2 (a span repeated
     verbatim makes all its k-shingles duplicated types);
  3. per doc, duplicated-shingle start positions merge into maximal
     spans whenever they overlap (gap < k tokens) — the gaps-and-islands
     machinery on the position axis;
  4. the manifest row is the merged span [start, end] in token indices.

K_SPAN = 8 tokens here: the fixture's documents average ~54 tokens (the
paper uses 50 on full web documents), and the 31-word fixture vocabulary
makes shorter shingles collide coincidentally; at 8 the duplicated types
are the planted copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

K_SPAN = 8

# Shared oracle prefix: positioned shingles -> duplicated types ->
# per-doc duplicated positions -> overlap-merged spans.
_SPANS_CTE = f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(
               list_slice(toks, CAST(i AS INT), CAST(i AS INT) + {K_SPAN - 1}),
               ' ') AS s
      FROM t, unnest(range(1, len(toks) - {K_SPAN - 2})) AS u(i)
    ),
    dup AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
    hits AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup USING (s)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {K_SPAN - 1}
                  THEN 0 ELSE 1 END AS new_span
      FROM hits
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(MAX(pos) + {K_SPAN - 1} AS BIGINT) AS span_end,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(MAX(pos) + {K_SPAN - 1} - MIN(pos) + 1 AS BIGINT) AS n_tokens
      FROM isl GROUP BY doc_id, grp
    )"""


def _span_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of _SPANS_CTE: (doc_id, span_start, span_end,
    n_shingles, n_tokens) — one row per maximal duplicated span."""
    d = tables(spark, sf_dir)["documents"]
    toked = d.select("doc_id", F.split(F.col("text"), " ").alias("toks")).filter(
        # Docs shorter than one shingle emit nothing on either engine
        # (DuckDB's range() is empty; Spark's sequence(1, n<1) would
        # count DOWN — the round9b/9c guard).
        F.size("toks") >= K_SPAN
    )
    sh = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {K_SPAN - 1}), "
                f"i -> concat_ws(' ', slice(toks, i, {K_SPAN})))"
            )
        ).alias("pos0", "s"),
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "s")
    dup = sh.groupBy("s").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 2)
    hits = sh.join(dup.select("s"), "s", "left_semi").select("doc_id", "pos")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.select(
        "doc_id",
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(wdoc) <= K_SPAN - 1, 0)
        .otherwise(1)
        .alias("new_span"),
    )
    isl = flagged.select(
        "doc_id",
        "pos",
        F.sum("new_span")
        .over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + K_SPAN - 1).cast("bigint").alias("span_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        (F.max("pos") + K_SPAN - 1 - F.min("pos") + 1).cast("bigint").alias("n_tokens"),
    ).drop("grp")


@query(
    "q_exact_substr_spans",
    oracle=_SPANS_CTE
    + """
    SELECT doc_id, span_start, span_end, n_shingles, n_tokens FROM spans
    """,
    tags=("dedup", "exact-substr", "llm-data", "round10"),
)
def q_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span-removal manifest (Lee et al. 2021): every
    maximal token span covered by corpus-duplicated {K_SPAN}-token
    shingles, per document — [span_start, span_end] in 1-based token
    indices plus the duplicated-shingle count and span token width.
    Overlapping duplicated shingles (start positions within k-1 of each
    other) merge into ONE span, so manifest rows are disjoint maximal
    regions — exactly what a removal pass consumes.

    Exactness: set algebra and integer positions end to end; the span
    merge is a LAG + running-sum gaps-and-islands, identical on both
    engines.

    Scale shape: shingle-grain throughout, never doc x doc — the
    duplicated-type census is one map-side-combinable groupBy over
    shingles (the corpus's shingle count is linear in tokens), the
    instance semi-join is shingle-keyed (production would key on a
    128-bit shingle hash to shrink shuffle width; text keys here keep
    the oracle portable), and the merge windows partition BY DOCUMENT —
    parallel across docs, sequential only within one doc's duplicated
    positions (bounded by doc length). The paper's suffix-array pass is
    single-machine; this shape is the cluster-native equivalent with
    the same >= k-token guarantee.
    """
    return _span_manifest(spark, sf_dir)


@query(
    "q_exact_substr_stats",
    oracle=_SPANS_CTE
    + """,
    perdoc AS (
      SELECT doc_id, CAST(SUM(n_tokens) AS BIGINT) AS dup_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY doc_id
    ),
    lens AS (
      SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks FROM t
    )
    SELECT l.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dups,
           CAST(SUM(COALESCE(p.n_spans, 0)) AS BIGINT) AS n_spans,
           CAST(SUM(l.n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(COALESCE(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
           CAST(SUM(COALESCE(p.dup_tokens, 0)) * 1000000
                // SUM(l.n_toks) AS BIGINT) AS dup_frac_q6
    FROM lens l LEFT JOIN perdoc p ON p.doc_id = l.doc_id
    GROUP BY l.source
    """,
    tags=("dedup", "exact-substr", "llm-data", "audit", "round10"),
)
def q_exact_substr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ExactSubstr impact census over the SAME span manifest
    (shared plan body — the capstone-reuse pattern, so the census can
    never drift from q_exact_substr_spans): documents affected, span
    count, duplicated-token mass, and the millionth-fraction of each
    source's tokens a removal pass would delete — the
    go/no-go number a corpus owner reads before running removal.

    Exactness: integer counts and one integer floor division.

    Scale shape: the manifest (span grain, small) aggregates per doc,
    then left-joins doc lengths at doc grain and collapses to source
    grain — all map-side-combinable aggregations on top of the
    q_exact_substr_spans plan.
    """
    spans = _span_manifest(spark, sf_dir)
    perdoc = spans.groupBy("doc_id").agg(
        F.sum("n_tokens").cast("bigint").alias("dup_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    d = tables(spark, sf_dir)["documents"]
    lens = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    return (
        lens.join(perdoc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("dup_tokens").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_dups"),
            F.sum(F.coalesce("n_spans", F.lit(0))).cast("bigint").alias("n_spans"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.sum(F.coalesce("dup_tokens", F.lit(0)))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "docs_with_dups",
            "n_spans",
            "total_tokens",
            "dup_tokens",
            F.expr("dup_tokens * 1000000 DIV total_tokens")
            .cast("bigint")
            .alias("dup_frac_q6"),
        )
    )

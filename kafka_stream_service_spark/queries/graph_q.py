"""Graph analytics over the dedup-candidate graph: triangle enumeration.

The near-dup family (operators/dedup.py, operators/graph.py) already
builds candidate PAIRS and connected components; triangles are the next
structure up — a triangle of mutually-candidate documents is the
strongest cluster signal short of full clique mining, and the classic
distributed-graph benchmark op.

Graph construction is the same rare-shingle blocking the LSH stack uses:
documents are linked when they share a 4-token shingle whose document
frequency is small (2..4) — frequent shingles are background vocabulary,
not similarity evidence, and dropping them is exactly the hot-bucket cap
of the LSH path re-expressed as a DF band.

Scale shape (100 TB): pairs-per-shingle is bounded by DF_max^2 = 16, so
the edge list grows linearly with corpus size, never quadratically. The
enumeration joins use the canonical ordered-edge algorithm (u < v < w):
each triangle is produced exactly once, and the two equi-joins
hash-partition on vertex ids. For skewed degree distributions the
standard refinement is degree-based orientation (point each edge from
low to high degree), which bounds the join fan-out by sqrt(|E|); the
DF cap already enforces a stronger bound here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query

SHINGLE_N = 4
RARE_DF_MIN = 2
RARE_DF_MAX = 4


@query(
    "q_triangle_candidates",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(0, greatest(len(toks) - {SHINGLE_N} + 1, 0)),
                                   i -> array_to_string(list_slice(toks, i + 1, i + {SHINGLE_N}), ' '))) AS g
      FROM t
    ),
    rare AS (
      SELECT g FROM sh GROUP BY g
      HAVING COUNT(*) BETWEEN {RARE_DF_MIN} AND {RARE_DF_MAX}
    ),
    e AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM sh a JOIN rare USING (g) JOIN sh b USING (g)
      WHERE a.doc_id < b.doc_id
    )
    SELECT e1.u AS doc_a, e1.v AS doc_b, e2.v AS doc_c
    FROM e e1
    JOIN e e2 ON e1.v = e2.u
    JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v
    """,
    tags=("graph", "dedup", "llm-data"),
)
def q_triangle_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate triangles in the rare-shingle candidate graph: triples of
    documents that are pairwise near-dup candidates (each pair shares a
    rare 4-gram). Ordered-edge algorithm — every triangle emitted exactly
    once as (doc_a < doc_b < doc_c)."""
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    sh = (
        d.filter(F.size(toks) >= SHINGLE_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - SHINGLE_N),
                    lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_N), " "),
                )
            ).alias("g"),
        )
        .distinct()
    )
    rare = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= RARE_DF_MIN) & (F.col("df") <= RARE_DF_MAX)
    )
    cand = sh.join(rare.select("g"), "g")
    edges = (
        cand.alias("a")
        .join(cand.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")))
        .select(
            F.col("e1.u").alias("doc_a"),
            F.col("e1.v").alias("doc_b"),
            F.col("e2.v").alias("doc_c"),
        )
    )

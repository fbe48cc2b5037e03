"""Modern SQL-surface operators (round 6 extension): correlated LATERAL
joins, null-safe equi-joins on dirty keys, VARIANT (semi-structured)
shredding, and recursive-CTE graph traversal — the Spark 4 SQL features
a user migrating from any contemporary engine expects to keep.

Where a feature exists verbatim in both engines (recursive CTE, LATERAL)
the SAME SQL text runs on Spark and DuckDB — the strongest possible
parity statement. Where Spark has the richer construct (VARIANT), the
oracle checks the typed round-trip against the base columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from ._util import dec
from .registry import query


# ---------------------------------------------------------------------------
# Correlated LATERAL join (top-n per group via subquery)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey, t.acctbal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) t
"""


@query(
    "q_lateral_topn",
    oracle=_LATERAL_SQL,
    tags=("sql-surface", "lateral", "join"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per nation via a correlated
    LATERAL subquery — the identical SQL text runs on Spark and DuckDB.

    Catalyst decorrelates the per-row ORDER BY ... LIMIT into a ranked
    window join (no nested-loop re-execution per outer row), so the
    physical plan is the same shape as q_window_topk_per_group — the
    LATERAL form is the user-facing surface, not a different engine
    path. Ties are impossible to misorder: (c_acctbal, c_custkey) is a
    total order.
    """
    t = tables(spark, sf_dir)
    t["nation"].createOrReplaceTempView("nation")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Null-safe equi-join on dirty keys
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
    WITH dc AS (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_nationkey END AS k
      FROM customer
    ),
    ds AS (
      SELECT CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE s_nationkey END AS k
      FROM supplier
    )
    SELECT (SELECT COUNT(*) FROM dc JOIN ds ON dc.k = ds.k) AS n_equi,
           (SELECT COUNT(*) FROM dc JOIN ds ON dc.k IS NOT DISTINCT FROM ds.k)
             AS n_nullsafe,
           (SELECT COUNT(*) FROM dc WHERE k IS NULL) AS n_null_cust,
           (SELECT COUNT(*) FROM ds WHERE k IS NULL) AS n_null_supp
"""


@query(
    "q_null_safe_join",
    oracle=_NULLSAFE_ORACLE,
    tags=("sql-surface", "join", "dirty-data"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe (<=>) vs plain equi-join semantics on deterministically
    dirtied keys (every 50th customer / 10th supplier loses its nation
    key): the plain join drops NULL keys, the null-safe join matches
    them to each other — the exact divergence the round-6 referential-
    integrity ADVICE fix was about, here surfaced as a first-class
    operator with both counts side by side.

    Scale shape: Spark compiles eqNullSafe into a HASH join on a
    null-coalesced key (no nested loop, no cartesian); both joins
    shuffle on the nation key; the four counts are 1-row aggregates
    combined by broadcast cross join.
    """
    t = tables(spark, sf_dir)
    dc = t["customer"].select(
        F.when(F.col("c_custkey") % 50 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("k")
    )
    ds = t["supplier"].select(
        F.when(F.col("s_suppkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("k")
    )
    n_equi = dc.join(ds, dc["k"] == ds["k"]).agg(
        F.count(F.lit(1)).alias("n_equi")
    )
    n_nullsafe = dc.join(ds, dc["k"].eqNullSafe(ds["k"])).agg(
        F.count(F.lit(1)).alias("n_nullsafe")
    )
    n_nc = dc.filter(F.col("k").isNull()).agg(F.count(F.lit(1)).alias("n_null_cust"))
    n_ns = ds.filter(F.col("k").isNull()).agg(F.count(F.lit(1)).alias("n_null_supp"))
    return (
        n_equi.crossJoin(F.broadcast(n_nullsafe))
        .crossJoin(F.broadcast(n_nc))
        .crossJoin(F.broadcast(n_ns))
    )


# ---------------------------------------------------------------------------
# VARIANT shredding (semi-structured ingest)
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
    SELECT event_type AS t,
           COUNT(*) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_v,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
"""


@query(
    "q_variant_shred",
    oracle=_VARIANT_ORACLE,
    tags=("sql-surface", "variant", "semi-structured"),
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingest through Spark's VARIANT type: each event is
    re-serialized to a nested JSON payload, parsed with parse_json into
    a VARIANT, then shredded back out with typed variant_get paths
    ('$.t' string, '$.v' decimal, '$.k' bigint, '$.u[0]' string) and
    aggregated. The oracle aggregates the base columns directly, so the
    driver hash proves the encode -> VARIANT -> typed-extract round
    trip is lossless — including the DECIMAL value surviving the JSON
    number representation.

    Scale shape: VARIANT parse/extract are JVM-side codegen expressions
    (no Python, no UDF); the whole query is one narrow map over events
    plus one map-side-combinable aggregation. This is the engine's
    schema-on-read path for telemetry whose payload evolves faster than
    its table schema.
    """
    ev = tables(spark, sf_dir)["events"]
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            dec("value", 10, 2).alias("v"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.array(F.col("user_id")).alias("u"),
        )
    )
    v = ev.select(F.parse_json(payload).alias("var"))
    shred = v.select(
        F.expr("variant_get(var, '$.t', 'string')").alias("t"),
        F.expr("variant_get(var, '$.v', 'decimal(10,2)')").alias("v"),
        F.expr("variant_get(var, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(var, '$.u[0]', 'string')").alias("u0"),
    )
    return shred.groupBy("t").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.sum("v").cast("double").alias("sum_v"),
        F.count_distinct("u0").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE: bounded-hop traversal of order-succession chains
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT src, dst FROM (
        SELECT o_orderkey AS src,
               lead(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS dst
        FROM orders
      ) e WHERE dst IS NOT NULL
    ),
    reach AS (
      SELECT src AS a, dst AS b, 1 AS hops FROM edges
      UNION ALL
      SELECT r.a, e.dst AS b, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.b
      WHERE r.hops < 3
    )
    SELECT hops, COUNT(*) AS n_pairs, CAST(SUM(a) AS BIGINT) AS sum_src
    FROM reach GROUP BY hops
"""


@query(
    "q_hops_recursive_cte",
    oracle=_RECURSIVE_SQL,
    tags=("sql-surface", "recursive", "graph"),
)
def q_hops_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop lineage traversal with a recursive CTE — the same
    WITH RECURSIVE text runs on Spark 4 and DuckDB. The graph is each
    customer's order-succession chain (consecutive orders by date), and
    the recursion walks up to 3 hops forward, the amendment-chain /
    provenance-walk shape.

    The hop cap in the recursive arm is the termination contract (the
    chains are acyclic, but a bound you can SEE beats one you infer);
    Spark additionally enforces spark.sql.cteRecursionLevelLimit.
    Scale shape: each recursion step is one equi-join of the frontier
    against the edge list on its shuffle key — the same iterative-join
    plan the DataFrame closure in q_dedup_clusters builds by hand, here
    authored declaratively. sum_src rides along so the driver hash pins
    pair identities, not just counts.
    """
    t = tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# Collation-aware comparison (Spark 4 COLLATE)
# ---------------------------------------------------------------------------

_COLLATE_ORACLE = """
    WITH a AS (SELECT DISTINCT p_brand AS b FROM part),
    mixed AS (  -- deterministic case mangling: odd-length brands lowered
      SELECT CASE WHEN length(b) % 2 = 1 THEN lower(b) ELSE b END AS b
      FROM a
    )
    SELECT (SELECT COUNT(*) FROM a JOIN mixed USING (b)) AS n_sensitive,
           (SELECT COUNT(*) FROM a JOIN mixed m ON lower(a.b) = lower(m.b))
             AS n_insensitive,
           (SELECT COUNT(DISTINCT lower(b)) FROM (SELECT b FROM a UNION ALL
                                                  SELECT b FROM mixed))
             AS n_distinct_ci
"""


@query(
    "q_collated_join",
    oracle=_COLLATE_ORACLE,
    tags=("sql-surface", "collation"),
)
def q_collated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive semantics through Spark 4 collations: brands vs
    a deterministically case-mangled copy, joined once binary
    (case-sensitive) and once under UNICODE_CI COLLATE — plus a
    collated COUNT(DISTINCT). The oracle expresses the same semantics
    via lower(): the fixture strings are ASCII, where UNICODE_CI and
    lowercase-fold agree exactly (the doc'd precondition; non-ASCII
    corpora need the ICU collation on both engines).

    Why collations beat lower() at scale: the collation is carried in
    the TYPE, so every downstream join/group/distinct on the column is
    case-insensitive without wrapping each reference in lower() — and
    Spark hashes the collation key directly (one pass, no derived
    column to materialize).
    """
    p = tables(spark, sf_dir)["part"]
    a = p.select("p_brand").distinct().select(F.col("p_brand").alias("b"))
    mixed = a.select(
        F.when(F.length("b") % 2 == 1, F.lower("b")).otherwise(F.col("b")).alias("b")
    )
    ci = "collate(b, 'UNICODE_CI')"
    n_sens = a.join(mixed, "b").agg(F.count(F.lit(1)).alias("n_sensitive"))
    n_ins = (
        a.selectExpr(f"{ci} AS bc")
        .join(mixed.selectExpr(f"{ci} AS bc"), "bc")
        .agg(F.count(F.lit(1)).alias("n_insensitive"))
    )
    n_dist = (
        a.unionAll(mixed)
        .selectExpr(f"{ci} AS bc")
        .agg(F.count_distinct("bc").alias("n_distinct_ci"))
    )
    return n_sens.crossJoin(F.broadcast(n_ins)).crossJoin(F.broadcast(n_dist))


# ---------------------------------------------------------------------------
# Join strategy hints
# ---------------------------------------------------------------------------

_HINTS_ORACLE = """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


@query(
    "q_join_hints",
    oracle=_HINTS_ORACLE,
    tags=("sql-surface", "hints", "join"),
)
def q_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: the same orders-customer aggregation
    with an explicit SHUFFLE_HASH hint — the escape hatch when the
    optimizer's choice (broadcast here, sort-merge at warehouse scale)
    is wrong for a workload the user knows better (e.g. the build side
    fits executor memory but exceeds the broadcast threshold, where
    hash beats sort-merge by skipping both sorts). Results must be
    hint-invariant — that IS the oracle check; the strategy actually
    taking effect is plan-asserted in tests/test_plans.py.
    """
    t = tables(spark, sf_dir)
    joined = t["orders"].join(
        t["customer"].hint("shuffle_hash"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
    )

"""Degree-oriented triangle enumeration (operators/graph.py) on skewed
graphs — the case the orientation exists for.

The catalog twin (q_triangle_oriented) hash-proves equivalence with the
naive ordered-edge enumeration on the rare-shingle graph; these tests
prove the properties that graph cannot exercise: correctness on a
hub-dominated star (where the naive u<v pivot would fan out
quadratically on the hub) and the wedge fan-out bound itself.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from kafka_stream_service_spark.operators.graph import oriented_triangles


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long"
    ).distinct()


def _naive_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({x for e in es for x in e})
    return sorted(
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def _result(df):
    return sorted((r.doc_a, r.doc_b, r.doc_c) for r in df.collect())


def test_star_with_rim_triangles(spark):
    """Hub 0 (the LOWEST id, worst case for the id-ordered pivot)
    connected to 40 spokes; consecutive spokes also linked, so every
    (hub, spoke_i, spoke_i+1) closes a triangle."""
    n = 40
    pairs = [(0, i) for i in range(1, n + 1)]
    pairs += [(i, i + 1) for i in range(1, n)]
    tri = _result(oriented_triangles(_edges_df(spark, pairs)))
    assert tri == _naive_triangles(pairs)
    assert len(tri) == n - 1


def test_two_hubs_and_bridges(spark):
    """Two hubs sharing all spokes — K2 x stars — plus the hub-hub edge:
    triangles are exactly (hub1, hub2, spoke_i)."""
    spokes = list(range(10, 30))
    pairs = [(1, s) for s in spokes] + [(2, s) for s in spokes] + [(1, 2)]
    tri = _result(oriented_triangles(_edges_df(spark, pairs)))
    assert tri == _naive_triangles(pairs)
    assert len(tri) == len(spokes)


def test_triangle_free_star_yields_nothing(spark):
    pairs = [(0, i) for i in range(1, 50)]
    assert _result(oriented_triangles(_edges_df(spark, pairs))) == []


def test_orientation_bounds_hub_fanout(spark):
    """The point of the orientation: on a star+rim graph the hub (degree
    n) must NOT pivot wedges. Reproduce the operator's internal
    orientation and assert the hub's out-degree is 0 (every spoke has
    lower degree, so all hub edges point INTO the hub), hence total
    wedge candidates stay O(n) instead of the naive pivot's O(n^2)."""
    n = 60
    pairs = [(0, i) for i in range(1, n + 1)] + [(i, i + 1) for i in range(1, n)]
    edges = _edges_df(spark, pairs)
    und = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select("a", F.col("deg").alias("da"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("db"))
    directed = (
        und.join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
    )
    out_deg = {r.a: r.n for r in directed.groupBy("a").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out_deg.get(0, 0) == 0  # the hub pivots no wedges
    # wedge work = sum over vertices of C(outdeg, 2): linear here
    wedge_work = sum(k * (k - 1) // 2 for k in out_deg.values())
    assert wedge_work <= 3 * n  # vs ~n^2/2 for the id-ordered pivot

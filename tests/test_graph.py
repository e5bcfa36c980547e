"""Known-answer tests for operators/graph.py (parity at scale is covered by
test_oracle_parity; these pin the combinatorics on a hand-checkable graph)."""

from __future__ import annotations

from ai_knowledge_etl_spark.operators.graph import triangle_stats


def test_triangle_stats_known_graph(spark):
    # two triangles sharing edge (2,3): {1,2,3} and {2,3,4};
    # degrees 2,3,3,2 -> wedges 1+3+3+1 = 8; clustering 3*2/8 = 0.75
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], ["src", "dst"]
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_triangles"] == 2
    assert row["n_wedges"] == 8
    assert row["global_clustering"] == 0.75


def test_triangle_stats_canonicalizes_input(spark):
    # duplicate edges, reversed direction, and self-loops must not change
    # the census: same graph as above plus noise
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (3, 4), (2, 4), (5, 5)],
        ["src", "dst"],
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_triangles"] == 2
    assert row["n_wedges"] == 8


def test_triangle_stats_triangle_free(spark):
    # star graph: wedges but no triangles; clustering must be 0, not NaN
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], ["src", "dst"]
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 6
    assert row["global_clustering"] == 0.0

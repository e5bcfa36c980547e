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


def test_recursive_cte_agrees_with_iterative_cc(spark):
    """Two independent closure mechanisms — the checkpointed min-label
    driver loop and Spark 4's native WITH RECURSIVE — must produce the
    same components on the same graph (100 chains of length 10)."""
    from pyspark.sql import functions as F

    from ai_knowledge_etl_spark.operators import clustering

    edges = (
        spark.range(1000)
        .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        .where((F.col("id") + 1) % 10 != 0)
    )
    loop = {
        (r["node"], r["cluster_id"])
        for r in clustering.connected_components(edges).collect()
    }
    edges.createOrReplaceTempView("cc_edges")
    cte = {
        (r["node"], r["cluster_id"])
        for r in spark.sql(
            """
            WITH RECURSIVE reach(node, lab) AS (
              SELECT a AS node, a AS lab FROM cc_edges
              UNION ALL
              -- UNION ALL only (Spark 4 restriction); the graph here is
              -- a DAG so recursion terminates, min() dedups at the end
              SELECT b AS node, r.lab
              FROM reach r JOIN cc_edges e ON e.a = r.node
            )
            SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
            """
        ).collect()
    }
    # the loop labels every edge endpoint; the CTE as written seeds from
    # edge sources only, so restrict to the common node set
    nodes = {n for n, _ in cte}
    assert {(n, c) for n, c in loop if n in nodes} == cte


def test_cc_loop_releases_prior_rounds(spark):
    """Each CC round localCheckpoints a fresh label table; round N-1's
    pinned copy must be unpersisted, or max_iter label tables accumulate
    in executor storage (ADVICE r1). After the run, only the edge
    checkpoint + the final labels may remain pinned beyond the baseline."""
    from ai_knowledge_etl_spark.operators.clustering import (
        connected_components,
    )

    sc = spark.sparkContext
    baseline = set(dict(sc._jsc.getPersistentRDDs()).keys())
    # a 12-node chain forces many propagation rounds (diameter ~ n)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    out = connected_components(edges)
    assert out.count() == 13  # materialize fully
    pinned_after = set(dict(sc._jsc.getPersistentRDDs()).keys()) - baseline
    assert len(pinned_after) <= 2, (
        f"CC loop leaked {len(pinned_after)} pinned RDDs (want <=2: "
        "edges + final labels)"
    )

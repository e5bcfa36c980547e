"""Property-based tests: the distributed graph operators vs pure-Python
references on random small graphs (hypothesis picks adversarial shapes —
self-loops, duplicate/reversed edges, disconnected components, cliques).

Few examples, small graphs: each example is a real Spark job, so the
budget goes to shape diversity, not volume (parity at data scale is
covered by test_oracle_parity)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_knowledge_etl_spark.operators.clustering import connected_components
from ai_knowledge_etl_spark.operators.graph import triangle_stats

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=30,
)


def _undirected(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def _ref_components(edges):
    """min-label per component via union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _undirected(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _ref_triangles(edges):
    und = _undirected(edges)
    nodes = {n for e in und for n in e}
    tri = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    deg = {n: sum(1 for e in und if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return tri, wedges


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    expected = _ref_components(edges)
    if not expected:  # only self-loops: operator sees an empty edge set
        return
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_triangle_stats_matches_bruteforce(spark, edges):
    tri, wedges = _ref_triangles(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges

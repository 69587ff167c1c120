"""Unit tests: connected components (operators/graph.py)."""

from __future__ import annotations

from convert_parquet_to_csv_spark.operators.graph import connected_components


def _cc(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(n, e)
    return {r.id: r.component for r in out.collect()}


def test_transitive_chain_merges(spark):
    # 1-2, 2-3: one component even though 1 and 3 share no edge;
    # 10 is isolated.
    got = _cc(spark, [1, 2, 3, 10], [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10}


def test_edge_orientation_irrelevant(spark):
    # min id on the dst side; both orientations propagate.
    got = _cc(spark, [5, 6, 7], [(7, 5), (6, 7)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_long_path_converges(spark):
    # path of 12 nodes — needs multiple propagation rounds
    nodes = list(range(12))
    edges = [(i, i + 1) for i in range(11)]
    got = _cc(spark, nodes, edges)
    assert set(got.values()) == {0}


def test_two_components(spark):
    got = _cc(spark, [1, 2, 3, 4], [(1, 2), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_pagerank_fixed_point_properties(spark):
    from convert_parquet_to_csv_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # star graph: 1<->2, 1<->3, 1<->4 (symmetrized); hub 1 must rank
    # highest; isolated node 9 keeps the teleport floor.
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "id long")
    pairs = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    r = {x.id: x.rank for x in pagerank_fixed_point(nodes, edges).collect()}
    assert r[1] > r[2] == r[3] == r[4] > r[9]
    assert abs(r[9] - 0.15 / 5) < 1e-9  # teleport-only floor
    # determinism across runs
    r2 = {x.id: x.rank for x in pagerank_fixed_point(nodes, edges).collect()}
    assert r == r2


def test_triangle_count_known_graphs(spark):
    from convert_parquet_to_csv_spark.operators.graph import triangle_count

    def count(pairs):
        edges = spark.createDataFrame(pairs, "src long, dst long")
        row = triangle_count(edges).collect()[0]
        return (row.n_nodes, row.n_edges, row.n_triangles)

    # K4: 4 triangles; reversed/duplicate/self edges must not matter
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
          (2, 1), (3, 3), (1, 2)]
    assert count(k4) == (4, 6, 4)
    # 4-cycle: no triangles
    assert count([(1, 2), (2, 3), (3, 4), (4, 1)]) == (4, 4, 0)
    # hub star (the degree-orientation stress case): no triangles
    star = [(0, i) for i in range(1, 30)]
    assert count(star) == (30, 29, 0)
    # hub star + one rim edge: exactly 1 triangle
    assert count(star + [(1, 2)]) == (30, 30, 1)

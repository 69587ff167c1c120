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


def test_k_core_known_graph(spark):
    """Triangle + pendant: the 2-core is exactly the triangle (the
    pendant node and its edge peel away); a 4-clique's 3-core is the
    whole clique."""
    from convert_parquet_to_csv_spark.operators.graph import k_core

    tri_plus_tail = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    core2 = {
        (r["node"], r["core_deg"])
        for r in k_core(tri_plus_tail, 2).collect()
    }
    assert core2 == {(1, 2), (2, 2), (3, 2)}
    clique4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src int, dst int",
    )
    core3 = {
        (r["node"], r["core_deg"]) for r in k_core(clique4, 3).collect()
    }
    assert core3 == {(i, 3) for i in range(4)}
    # cascade: a path has an empty 2-core
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src int, dst int"
    )
    assert k_core(path, 2).count() == 0


def test_k_core_members_have_core_degree_at_least_k(spark, sf_small):
    """Every gated-query core member's reported degree is >= k, and
    the peel depth stays within the oracle's unrolled rounds."""
    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.plans.dedup_queries import (
        _KCORE_UNROLL,
    )

    registry.load_all()
    rows = registry.QUERIES["kcore_copurchase"](spark, sf_small).collect()
    assert rows, "3-core empty at sf0.001 — fixture drifted?"
    for r in rows:
        assert r["core_deg"] >= 3
    # depth pin: replay the peel and count rounds to fixpoint
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans.common import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    cur = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .localCheckpoint()
    )
    n = cur.count()
    depth = None
    for i in range(1, _KCORE_UNROLL + 1):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= 3).select("node")
        cur = (
            cur.join(alive.select(F.col("node").alias("u")), "u", "left_semi")
            .join(alive.select(F.col("node").alias("v")), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        m = cur.count()
        if m == n:
            depth = i
            break
        n = m
    assert depth is not None and depth <= _KCORE_UNROLL, (
        "peeling depth exceeds the oracle unroll — raise _KCORE_UNROLL"
    )


def test_twohop_bounds(spark, sf_small):
    """2-hop reach is >= degree (1-hop included) and <= the whole
    component minus self; a triangle's every node reaches the other
    two and nothing more."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["twohop_neighborhood_size"](
        spark, sf_small
    ).collect()
    assert rows
    n_nodes = len(rows)
    for r in rows:
        assert 1 <= r["n_within_2_hops"] <= n_nodes - 1

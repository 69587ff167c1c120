"""Iterative graph operators: connected components for dedup clusters.

Near-duplicate pairs form a graph; the *clusters* a curation pipeline
actually needs (keep one doc per cluster, count cluster mass, audit
what got merged) are its connected components — pairwise survivors
under-merge whenever A~B and B~C but A≁C. The reference has nothing
iterative at all; this is the canonical "algorithm, not a query" case
the DataFrame API still covers cleanly.

Algorithm: hash-min label propagation. Every node starts labeled with
itself; each round every node takes the min label in its closed
neighborhood; stop when no label changed. Rounds = component diameter
(near-dup clusters are shallow — diameter is small in practice; the
O(log n)-round alternative for adversarially long chains is
large-star/small-star contraction, Kiveris et al., "Connected
Components in MapReduce and Beyond").

Scale shape per round: one join labels⨝edges (hash-partitioned on the
node id) + one groupBy min — partial aggregation map-side, so shuffle
volume is O(edges) rows of (long, long). Labels are
``localCheckpoint``-ed every round: iterative plans otherwise grow
lineage linearly and re-execute the whole history each action.
Convergence is detected with an aggregate (count of changed labels),
not a collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the min node id in its component.

    ``nodes``: one column ``id_col`` (isolated nodes keep their own
    label). ``edges``: (src, dst) undirected pairs, any orientation.
    Returns (id_col, ``component``). Deterministic — min is
    order-independent.
    """
    # Symmetrize once: propagation needs both directions.
    fwd = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    )
    sym = fwd.union(
        edges.select(F.col(dst_col).alias("_u"), F.col(src_col).alias("_v"))
    ).distinct().persist()

    labels = nodes.select(
        F.col(id_col).alias("_u"), F.col(id_col).alias("_lbl")
    ).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        # min label over the closed neighborhood of each node
        neighbor_min = (
            sym.join(labels, "_u")
            .groupBy(F.col("_v").alias("_u"))
            .agg(F.min("_lbl").alias("_nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, "_u", "left")
            .select(
                "_u",
                F.least(
                    "_lbl", F.coalesce("_nlbl", F.col("_lbl"))
                ).alias("_lbl"),
                (F.col("_nlbl") < F.col("_lbl")).alias("_chg"),
            )
        ).localCheckpoint()  # cut lineage; also materializes for the count
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break

    sym.unpersist()
    if not converged:
        # Partially-propagated labels are silently WRONG (one component
        # reported as several) — refuse rather than mislabel.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter or "
            "switch to large-star/small-star contraction"
        )
    return labels.select(
        F.col("_u").alias(id_col), F.col("_lbl").alias("component")
    )


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """PageRank with damping 0.85, entirely in integer arithmetic.

    Ranks live as fixed-point BIGINTs (``scale`` = 1e12): every step is
    integer division / multiplication / summation, so the result is
    bitwise identical in ANY engine that repeats the recurrence — what
    makes an iterative float algorithm value-hash checkable (the same
    trick as the centroid sums, compounded across iterations without
    drift). Dangling nodes keep the teleport term only (their mass is
    not redistributed — a documented simplification both sides share).

    Per iteration: one join ranks⨝edges on the source + one groupBy on
    the destination — O(edges) shuffle rows, localCheckpoint'ed to keep
    the plan flat. Undirected graphs: pass both orientations in
    ``edges``.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col(id_col), F.lit(0.0).alias("rank")
        )
    base = (15 * scale) // (100 * n_nodes)
    init = scale // n_nodes

    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # Loop-invariant: edges carrying their source's out-degree — join
    # once, persist, and only the ranks side changes per iteration.
    ew = e.join(outdeg, "_src").persist()

    ranks = nodes.select(
        F.col(id_col).alias("_n"), F.lit(init).cast("long").alias("_r")
    ).localCheckpoint()

    for _ in range(n_iters):
        contribs = (
            ew.join(ranks, ew._src == ranks._n)
            .select(
                F.col("_dst").alias("_n"),
                F.expr("_r DIV _deg").alias("_c"),
            )
            .groupBy("_n")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            ranks.select("_n")
            .join(contribs, "_n", "left")
            .select(
                "_n",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        "coalesce(_s, CAST(0 AS BIGINT)) * 85 DIV 100"
                    )
                ).alias("_r"),
            )
            .localCheckpoint()
        )

    ew.unpersist()
    return ranks.select(
        F.col("_n").alias(id_col),
        (F.col("_r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact global triangle count over an undirected graph — the
    density/clustering companion to :func:`connected_components`
    (a dup-cluster audit: triangle-rich components are genuine
    near-dup families, triangle-free stars are often one hub false
    positive away from over-merging).

    Scale shape — DEGREE-ORDERED orientation (the MapReduce-classic
    Suri & Vassilvitskii "last reducer" fix): each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one,
    so out-degrees are bounded by O(√E) and no single key dominates
    any shuffle (the hub pathology of co-occurrence graphs).

    Counting is EDGE-ITERATOR over the oriented graph (r4): build
    per-node sorted out-neighbor arrays once (groupBy + collect_list
    — array sizes bounded by the orientation), join each oriented
    edge (a, b) to both endpoints' arrays, and count
    ``size(array_intersect(N⁺(a), N⁺(b)))`` — every triangle is
    counted exactly once at its base edge. Measured A/B on the sf0.1
    co-purchase graph (20k nodes, 1.2M edges, avg degree 120,
    local[32] warm): the previous wedge-join form (w1 ⋈ w2 on the
    middle vertex, left-semi against the closing edge) materialized
    ~35M wedge rows for 8.9-12.0 s; the edge-iterator runs the same
    count in 5.1-5.9 s — the intersect happens inside a codegen'd
    native expression on ~120-element sorted arrays instead of a
    shuffled join output. (``array_intersect`` is a native
    expression, NOT a lambda higher-order function — the HOF
    codegen caveat measured in dedup._hashed_shingle_table does not
    apply.) Shuffle volume is edges + 2× adjacency ≈ 3×E rows
    total, independent of wedge count. The count is
    orientation-invariant, so an oracle may verify with the naive
    id-ordered form on small data.

    Self-loops are dropped, parallel edges collapse via distinct.
    Returns one row: (n_nodes, n_edges, n_triangles), all BIGINT.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # e feeds degrees, orientation, and the edge count; oriented
        # feeds both wedge sides and the closing semi-join — persist
        # both so consumers share one materialization instead of
        # re-deriving the edge set (~25% on the sf0.1 co-purchase
        # graph; the wedge join still dominates).
        .persist()
    )
    # deg is referenced by BOTH orientation branches (du, dv) and the
    # n_nodes count. Persisting it is load-bearing, not a micro-opt:
    # under AQE the two branch subtrees do not reliably hit e's
    # cache, so an unpersisted deg re-ran the full edge
    # derivation per branch — measured 18.7 s vs 0.48 s for the
    # orientation join at sf0.01 (local[32], 200 shuffle
    # partitions) with deg persisted. Node-count rows: tiny.
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .persist()
    )
    du = deg.select(
        F.col("n").alias("u"), F.col("d").alias("_du")
    )
    dv = deg.select(
        F.col("n").alias("v"), F.col("d").alias("_dv")
    )
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .persist()
    )
    adj = oriented.groupBy("a").agg(
        F.sort_array(F.collect_list("b")).alias("nbrs")
    )
    na = adj.select(
        F.col("a").alias("_xa"), F.col("nbrs").alias("_na")
    )
    nb = adj.select(
        F.col("a").alias("_xb"), F.col("nbrs").alias("_nb")
    )
    tri = (
        oriented.join(na, oriented.a == F.col("_xa"))
        .join(nb, oriented.b == F.col("_xb"))
        .select(
            F.size(F.array_intersect("_na", "_nb")).alias("_c")
        )
        .agg(
            F.coalesce(F.sum("_c"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    out = (
        deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
        .crossJoin(e.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(tri)
        # Materialize the 1-row result eagerly so the caches can be
        # released NOW — returning a lazy plan would pin both cached
        # edge tables for the rest of a long-lived gate/bench session.
        .localCheckpoint()
    )
    oriented.unpersist()
    deg.unpersist()
    e.unpersist()
    return out


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Peel to the k-core: the maximal subgraph where every node has
    degree ≥ k — the standard densest-region extractor (spam/boiler-
    plate hubs in dup graphs, community nuclei in co-occurrence
    graphs). Iterative peeling: drop all nodes with degree < k,
    recompute, repeat to fixpoint.

    Returns ``(node, core_deg)`` for k-core members, core_deg being
    the degree WITHIN the core (≥ k by definition).

    Scale shape per round: one degree groupBy (partial-agg'd) + two
    semi-joins to keep edges between survivors — everything hash-
    partitioned on node ids; edge set ``localCheckpoint``-ed per
    round (same lineage hygiene as connected_components above).
    Convergence = edge count unchanged (a count, never a collect).
    Rounds needed = peeling depth, bounded by graph degeneracy — tiny
    for real co-occurrence graphs. Early exit is safe at any cap: a
    converged round is a no-op, so "at most N rounds" and "exactly N
    rounds" produce identical results once fixpoint is inside N (the
    oracle-replay property the gated query pins at N=5).

    Raises if still shrinking after ``max_rounds`` — a partial peel
    is NOT the k-core and must not be returned silently.
    """
    cur = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = cur.count()
    converged = n_edges == 0
    for _ in range(max_rounds):
        if converged:
            break
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # alive feeds BOTH semi-join branches; eager-materialize it
        # (node-sized) so the degree groupBy runs once per round, not
        # once per branch — the same double-recompute class fixed in
        # triangle_count's orientation (cur is a checkpoint, so the
        # branches re-aggregate rather than re-derive, but at 100 TB
        # an extra full-edge groupBy per round is still the largest
        # avoidable cost in the peel).
        alive = (
            deg.filter(F.col("deg") >= k)
            .select("node")
            .localCheckpoint()
        )
        nxt = (
            cur.join(
                alive.select(F.col("node").alias("u")), "u", "left_semi"
            )
            .join(
                alive.select(F.col("node").alias("v")), "v", "left_semi"
            )
            .select("u", "v")
            .localCheckpoint()
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            converged = True
        n_edges = n_next
    if not converged:
        raise RuntimeError(
            f"k_core still peeling after {max_rounds} rounds; raise "
            "max_rounds (peeling depth exceeds the cap)"
        )
    return (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
    )

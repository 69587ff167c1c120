"""Similarity search over embedding columns (``array<float>``).

Three strategies, increasing scale-fitness:

- **brute force**: broadcast the (small) query set, cross-join against
  the vector table, cosine per pair, per-query top-k window. Exact;
  cost O(|vectors|·|queries|) — the correctness baseline and fine
  whenever queries are few.
- **random-hyperplane LSH**: sign-signature bucketing; candidates are
  bucket collisions, scored exactly. Sub-linear probe cost; recall
  traded via signature width / probe count.
- **IVF (inverted file)**: coarse-quantize vectors to the nearest of C
  deterministic centroids (one broadcast join), probe the nprobe
  nearest lists per query. The classic billion-scale layout: each
  query touches |vectors|·nprobe/C instead of |vectors|.

All pure DataFrame expressions (functions/vectors.py dot products are
codegen'd ``aggregate``/``zip_with``); no UDFs, no collect of vector
data — only centroid sets (≤ a few thousand rows) are broadcast.
"""

from __future__ import annotations

try:  # baked into the target environment; guarded per SURVEY §8 policy
    import numpy as np
    import pandas as pd
except ImportError:  # pragma: no cover
    np = pd = None  # type: ignore[assignment]

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)


def topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, similarity).

    ``queries`` must be broadcast-small (it is hint-broadcast); the
    big side streams — no shuffle of the vector table, one window per
    query partition for the top-k.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv")
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(q))
        .withColumn("similarity", cosine_similarity("_qv", "_v"))
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, "neighbor_id", "similarity")
    )


# --------------------------------------------------------------------------
# random-hyperplane LSH
# --------------------------------------------------------------------------

def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane (splitmix64-style
    integer mix of (bit, i) — reproducible everywhere, no RNG state)."""
    comps = []
    for i in range(dim):
        x = (bit * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        comps.append(1.0 if x & 1 else -1.0)
    return comps


def _sig_from_planes(vec_col, planes) -> "F.Column":
    """LONG signature from an ``array<array<double>>`` planes column:
    bit b = sign of ⟨vec, planes[b]⟩, packed by a left fold
    (acc·2 + bit — signatures only ever compare for equality, so the
    packing order just has to be consistent). One compact higher-order
    expression regardless of nbits."""
    return F.aggregate(
        F.transform(
            planes,
            lambda p: F.when(
                dot_product(vec_col, p) >= 0, F.lit(1).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc * F.lit(2).cast("long") + x,
    )


def lsh_signature(vec_col, dim: int, nbits: int = 16, table: int = 0):
    """Pack nbits sign-of-projection bits into one LONG column.

    ``table`` offsets the hyperplane seed so each LSH table draws
    independent planes. The planes ship as ONE nested array literal —
    with per-bit literal arrays the AST grows to nbits×dim nodes and
    Catalyst analysis time dominates small queries (measured 14 s for
    32×5 planes at sf0.01; ~1 s with the nested literal)."""
    planes = F.lit(
        [_hyperplane(dim, table * nbits + b + 1) for b in range(nbits)]
    )
    return _sig_from_planes(vec_col, planes)


def lsh_table_signatures(vec_col, dim: int, nbits: int, n_tables: int):
    """``array<struct<_table int, _sig long>>`` — every table's
    signature in one expression over a single 3-level plane literal
    (table → bit → component). Explode it to get the (id, table, sig)
    bucket layout.

    Pure-Column flavor (no Python anywhere). Higher-order-function
    lambdas evaluate interpreted per element, so the n_tables·nbits·dim
    multiply-adds per row cost ~9 s for 32×5×64 over 5k rows — prefer
    :func:`lsh_table_signatures_arrow` on the hot path; this stays as
    the dependency-free reference implementation."""
    all_planes = F.lit(
        [
            [_hyperplane(dim, t * nbits + b + 1) for b in range(nbits)]
            for t in range(n_tables)
        ]
    )
    return F.transform(
        all_planes,
        lambda tbl, t: F.struct(
            t.cast("int").alias("_table"),
            _sig_from_planes(vec_col, tbl).alias("_sig"),
        ),
    )


def lsh_table_signatures_arrow(dim: int, nbits: int, n_tables: int):
    """Vectorized signature engine: a pandas UDF computing ALL table
    signatures per batch as ONE numpy matmul (N×dim @ dim×(T·B)) —
    the Arrow-batched escape hatch for exactly the workload
    whole-stage codegen handles worst (dense per-row linear algebra
    through interpreted HOF lambdas; measured ~50× faster at sf0.1).

    Same hyperplanes and bit-packing as the Column flavor (first plane
    = most significant bit). Returns a UDF: ``udf(vec_col) →
    array<long>`` of length ``n_tables``; ``posexplode`` it to the
    (table, sig) bucket layout. Sign-at-zero could differ from the
    sequential fold in the last ulp of a projection, which moves a
    vector to a neighboring bucket — bucketing is probabilistic
    already, so recall gates are unaffected; within one run both sides
    use the same engine, so candidates stay consistent.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    if pd is None:
        raise ImportError(
            "pandas/numpy unavailable — use lsh_table_signatures "
            "(engine='sql') instead"
        )

    planes = np.array(
        [
            _hyperplane(dim, t * nbits + b + 1)
            for t in range(n_tables)
            for b in range(nbits)
        ],
        dtype=np.float64,
    ).T  # dim × (T·B)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _sigs(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)  # N × dim
        proj = x @ planes  # N × T·B
        bits = (proj >= 0).astype(np.int64).reshape(
            -1, n_tables, nbits
        )
        sigs = (bits * weights).sum(axis=2)  # N × T
        return pd.Series([row.tolist() for row in sigs])

    return _sigs


def topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    engine: str = "arrow",
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to LSH candidates.

    Multi-table (OR-amplified) hyperplane LSH: ``n_tables`` independent
    ``nbits``-bit signatures; a pair is a candidate if it collides in
    ANY table. One table alone has collision probability
    (1 - θ/π)^nbits — negligible for the moderate-similarity neighbors
    that dominate real top-k — so recall comes from the union across
    tables: 1-(1-p)^L. Tuning: nbits controls per-table bucket size
    (probe cost), n_tables buys recall linearly in index size. The
    explode is n_tables× on (id, bucket) keys only; vectors themselves
    are not replicated through the shuffle (joined back by id), and
    candidate pairs are deduped before exact scoring.

    ``engine``: 'arrow' (default) computes signatures via the
    batched-matmul pandas UDF; 'sql' uses the pure-Column HOF
    expression (no Python dependency, ~50× slower per row)."""
    if engine == "arrow":
        sig_udf = lsh_table_signatures_arrow(dim, nbits, n_tables)

        def _buckets(df: DataFrame, out_id: str) -> DataFrame:
            return df.select(
                F.col(id_col).alias(out_id),
                F.posexplode(sig_udf(F.col(vec_col))).alias(
                    "_table", "_sig"
                ),
            )

        v_buckets = _buckets(vectors, "neighbor_id")
        q_buckets = _buckets(queries, query_id_col)
    else:
        tables = F.explode(
            lsh_table_signatures(F.col(vec_col), dim, nbits, n_tables)
        ).alias("_tb")
        v_buckets = vectors.select(
            F.col(id_col).alias("neighbor_id"), tables
        ).select("neighbor_id", "_tb._table", "_tb._sig")
        q_buckets = queries.select(
            F.col(id_col).alias(query_id_col), tables
        ).select(query_id_col, "_tb._table", "_tb._sig")
    candidates = (
        v_buckets.join(F.broadcast(q_buckets), ["_table", "_sig"])
        .select(query_id_col, "neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv")
    )
    scored = (
        candidates.join(v, "neighbor_id")
        .join(F.broadcast(q), query_id_col)
        .withColumn("similarity", cosine_similarity("_qv", "_v"))
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, "neighbor_id", "similarity")
    )


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------

def _assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Top-``n_probe``-cosine centroid assignment (broadcast,
    deterministic).

    THE assignment rule shared by index build, k-means training, and
    post-training reassignment — one definition so the
    determinism-critical tie-break (cosine desc, then ``_list_id``)
    can never drift between them. Adds ``_list_id`` to ``vectors``.
    ``n_probe=1`` (every existing caller) is plain argmax; ``n_probe
    >= 2`` emits one row per (vector, nearest-i-th centroid) — the
    multi-probe flavor semdedup uses so cluster-BOUNDARY near-dup
    pairs co-bucket in at least one list. Membership at n_probe=p is
    by construction a SUPERSET of membership at p-1 (same ranking,
    longer prefix), which makes multi-probe recall monotone — pinned
    by tests/test_similarity.py::test_semdedup_multiprobe.
    """
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim", cosine_similarity(vec_col, "_cv")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("_list_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .drop("_rn", "_csim", "_cv")
    )


def ivf_index(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned): deterministic coarse quantizer.

    Centroids = the n lowest-md5(id) vectors (a seeded uniform sample,
    same trick as the hash sampler — deterministic, no k-means
    iterations; IVF recall cares about *coverage*, not optimality).
    Assignment = one broadcast cross-join argmin. ``assigned`` carries
    ``_list_id`` — at scale you'd write it partitioned by list.
    """
    centroids = (
        vectors.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("_list_id"), F.col(vec_col).alias("_cv")
        )
    )
    assigned = _assign_to_centroids(vectors, centroids, id_col, vec_col)
    return centroids, assigned


def topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Approximate top-k probing the nprobe nearest inverted lists.

    ``kmeans_iters > 0`` refines the sampled centroids with that many
    deterministic spherical-Lloyd rounds before assignment — tighter
    lists, better recall-per-probe at the cost of the training scans.
    """
    centroids, assigned = ivf_index(vectors, n_centroids, id_col, vec_col)
    if kmeans_iters > 0:
        centroids = kmeans_refine_centroids(
            vectors, centroids, kmeans_iters, id_col, vec_col
        )
        assigned = _assign_to_centroids(vectors, centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv")
    )
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim", cosine_similarity("_qv", "_cv")
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.desc("_csim"), F.asc("_list_id")
    )
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "_qv", "_list_id")
    )
    scored = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_v"),
            "_list_id",
        )
        .join(F.broadcast(probes), "_list_id")
        .withColumn("similarity", cosine_similarity("_qv", "_v"))
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, "neighbor_id", "similarity")
    )


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs: cosine ≥ threshold.

    LSH-bucketed self-join (near-identical vectors collide with high
    probability at small nbits), scored exactly. For modest tables
    pass ``dim=None`` to skip bucketing (exact all-pairs)."""
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if dim is not None:
        v = v.withColumn("_bucket", lsh_signature(F.col("_v"), dim, nbits))
        join_keys = ["_bucket"]
    else:
        v = v.withColumn("_bucket", F.lit(0))
        join_keys = ["_bucket"]
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bucket")
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_bucket")
    return (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("similarity", cosine_similarity("_va", "_vb"))
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
    )


# --------------------------------------------------------------------------
# k-means centroid refinement (spherical Lloyd iterations)
# --------------------------------------------------------------------------

def kmeans_refine_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refine IVF centroids with deterministic spherical k-means.

    Each Lloyd round: assign every vector to its max-cosine centroid
    (broadcast argmin — the vector table never shuffles on vectors),
    recompute each centroid as the L2-normalized elementwise mean of
    its members, keep the old centroid for empty lists. A fixed
    iteration count, cosine tie-break on ``_list_id``, and fixed-point
    long accumulation (floor(x·1e9): exact, order-independent) make
    the result a pure function of the inputs — double sums would vary
    with task scheduling and wobble the recall gates.

    Scale shape per round: one broadcast join + argmin window over the
    vectors, then a (list, dim-position) partial aggregation whose
    output is k·dim rows. Centroids are localCheckpoint'ed per round
    to keep the iterative plan flat.
    """
    from convert_parquet_to_csv_spark.functions.vectors import l2_normalize

    for _ in range(n_iters):
        assigned = _assign_to_centroids(
            vectors, centroids, id_col, vec_col
        ).select("_list_id", vec_col)
        flat = assigned.select(
            "_list_id", F.posexplode(vec_col).alias("_pos", "_val")
        ).select(
            "_list_id",
            "_pos",
            F.floor(F.col("_val").cast("double") * F.lit(1_000_000_000))
            .cast("long")
            .alias("_fx"),
        )
        means = flat.groupBy("_list_id", "_pos").agg(
            (
                F.sum("_fx").cast("double")
                / F.count("*")
                / F.lit(1_000_000_000)
            ).alias("_m")
        )
        new_cv = means.groupBy("_list_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_m")))
                ),
                lambda s: s["_m"],
            ).alias("_cv_new")
        )
        centroids = (
            centroids.join(new_cv, "_list_id", "left")
            .select(
                "_list_id",
                F.coalesce(
                    l2_normalize("_cv_new"), F.col("_cv")
                ).alias("_cv"),
            )
            .localCheckpoint()
        )
    return centroids


def sparse_cosine_topk_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 2,
    max_df_denom: int = 10,
) -> DataFrame:
    """Sparse tf-idf cosine top-k similar pairs via an inverted-index
    self-join — the SPARSE-vector twin of the dense embedding paths
    above (same query surface, no embedding model needed).

    Exactness design (registry determinism rules): weights are
    INTEGERS ``tf * (N div df)`` — the repo's ln-free idf convention
    — so dot products and norms² are exact BIGINT sums; cosine is
    one shared double expression ``dot / sqrt(n2a * n2b)`` at the
    very end, bit-identical cross-engine.

    Scale shape: candidate pairs come only from shared terms, and two
    pruning rules bound the posting lists the self-join explodes —
    ``df >= min_df`` (df=1 terms can't create pairs) and
    ``df * max_df_denom <= N`` (stop-term guard: no posting list
    longer than N/denom, so the join is Σ df² over kept terms, never
    docs²). Same role as the LSH ``max_bucket`` hot-bucket drop.
    Shuffles: tf (doc,term), df (term), postings self-join (term),
    pair agg (d1,d2), one d1 window — all key-partitioned, no
    broadcast of anything data-proportional.
    """
    from convert_parquet_to_csv_spark.functions.text import tokens

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    keep = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") * max_df_denom <= F.col("n_corpus"))
        )
        .select("term", "df", "n_corpus")
    )
    # Persist the weighted postings: they feed THREE consumers (both
    # sides of the self-join and the norms) and Spark re-executes the
    # whole tokenize→tf→df lineage per consumer otherwise (audited:
    # 22 exchanges in the pre-persist executed plan; cached, the
    # lineage runs once — same pattern as the shared shingle profiles
    # in operators/dedup.py).
    w = (
        tf.join(keep, "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * F.expr("n_corpus div df")
            ).cast("bigint").alias("w"),
        )
        .persist()
    )
    norm2 = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("bigint").alias("dot")
        )
    )
    x, y = norm2.alias("x"), norm2.alias("y")
    cos = (
        dots.join(x, F.col("d1") == F.col("x.doc_id"))
        .join(y, F.col("d2") == F.col("y.doc_id"))
        .select(
            "d1",
            "d2",
            "dot",
            (
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("x.n2").cast("double")
                    * F.col("y.n2").cast("double")
                )
            ).alias("cosine"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("d1").orderBy(F.desc("cosine"), F.asc("d2"))
    )
    return (
        cos.withColumn("rk", rk.cast("int"))
        .filter(F.col("rk") <= k)
        .select("d1", "d2", "dot", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic dedup (Abbas et al. 2023,
# arXiv:2303.09540)
# --------------------------------------------------------------------------

def semdedup(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Survivors of SemDeDup semantic deduplication: k-means-cluster
    the embeddings, compare pairs ONLY within a cluster, drop the
    greater id of every within-cluster pair with cosine ≥ threshold
    (min-id survivor — the same keep policy as dedup.drop_near_duplicates).

    This is the SCALE PATH for embedding near-dup that
    :func:`embedding_dup_pairs`'s exact all-pairs flavor is not: the
    self-join is bucketed by ``_list_id`` (cluster sizes ~N/k; the
    paper sizes k so clusters stay comparison-bounded), so candidate
    volume is Σ|cluster|² rather than N². Clustering is the
    deterministic pipeline shared with IVF — seeded md5 sample →
    fixed-iteration spherical Lloyd with fixed-point accumulation —
    so the survivor set is a pure function of the inputs.

    Approximation contract: every within-cluster pair is a true
    cosine pair, so the drop set is a SUBSET of the exact all-pairs
    drop set (soundness — gated in plans/similarity_queries.py);
    pairs straddling a cluster boundary are missed (the paper's
    accepted recall trade).

    ``n_probe >= 2`` is the standard boundary mitigation (VERDICT r6
    item 7): each vector joins its ``n_probe`` nearest clusters, so a
    boundary pair co-buckets whenever EITHER side's probe list
    reaches the other's cluster. Monotone by construction —
    membership at n_probe=p is a superset of p-1, so the drop set
    (and recall vs exact) can only grow, while soundness is untouched
    (pairs are still true cosine pairs). Cost: candidate volume
    scales ~n_probe² in the worst case (each side duplicated
    n_probe×); the paper-shaped sweet spot is n_probe=2. Measured at
    the gated-query settings (threshold 0.35, 16 clusters, 2 Lloyd
    iters) for n_probe 1 → 2: recall vs the exact all-pairs drop set
    0.374 → 0.679 on the sf0.001 embeddings and 0.338 → 0.701 on
    sf0.01, drop sets remaining exact-subsets (sound) and the
    n_probe=2 drop set a superset of n_probe=1's in both runs.

    ``assigned`` is persisted (both self-join sides reference it);
    caller releases via clearCache() — the lsh_candidate_pairs
    contract.
    """
    sample, _ = ivf_index(vectors, n_clusters, id_col, vec_col)
    centroids = kmeans_refine_centroids(
        vectors, sample, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    assigned = _assign_to_centroids(
        vectors, centroids, id_col, vec_col, n_probe=n_probe
    ).select(id_col, vec_col, "_list_id").persist()
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        "_list_id",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        "_list_id",
    )
    losers = (
        a.join(b, "_list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity("_va", "_vb") >= threshold)
        .select(F.col("id_b").alias(id_col))
        # multi-probe emits the same pair once per shared cluster;
        # distinct() already collapses that (it exists for the
        # n_probe=1 case too — a loser can lose to many winners)
        .distinct()
    )
    return vectors.join(losers, id_col, "left_anti")

"""Driver-checked queries: similarity search over the embeddings table.

The brute-force oracle reproduces Spark's arithmetic exactly:
float32→float64 element casts, left-to-right float64 accumulation,
cosine = dot/(√dot_aa·√dot_bb). Verified bitwise-identical against
DuckDB's ``list_dot_product`` (same sequential order) — so even the
top-k *membership* agrees and no rounding is needed. (DuckDB's own
``list_cosine_similarity`` is NOT used: it clamps differently.)

LSH / IVF top-k variants depend on Spark-side hash signatures, so
their neighbor ROW SETS are not SQL-replayable — since r6 each is
gated as a single-row property check (``_TOPK_GATE_ORACLE``: group
count, exactly-k rows, recall bound, unit-range scores) on top of the
standalone oracle-checked recall gates (``similarity_*_recall``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import similarity as S
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet

_K = 3
_NQ = 5  # queries = vec_id < 5
_DIM = 64


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))


_DDOT = "list_dot_product({a}, {b})"


def _dcos(a: str, b: str) -> str:
    return (
        f"{_DDOT.format(a=a, b=b)} / "
        f"(sqrt({_DDOT.format(a=a, b=a)}) * sqrt({_DDOT.format(a=b, b=b)}))"
    )


_BRUTE_ORACLE = f"""
WITH vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM vd WHERE vec_id < {_NQ}
), scored AS (
  SELECT q.query_id, vd.vec_id AS neighbor_id, {_dcos('q.qv', 'vd.v')} AS similarity
  FROM vd, q WHERE vd.vec_id != q.query_id
), ranked AS (
  SELECT *, row_number() OVER (
      ORDER BY similarity DESC, neighbor_id ASC
    ) AS _rn_all,
    row_number() OVER (
      PARTITION BY query_id ORDER BY similarity DESC, neighbor_id ASC
    ) AS _rn
  FROM scored
)
SELECT query_id, neighbor_id, similarity FROM ranked WHERE _rn <= {_K}
"""


@query("similarity_topk_bruteforce", oracle=_BRUTE_ORACLE)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbors for the first 5 vectors."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    return S.topk_bruteforce(vecs, queries, k=_K)


# Property-gate oracle for the ANN top-k entries (VERDICT r5 item 2,
# the sample_exact_n_rand device): DuckDB cannot replay the Spark-side
# hash signatures, so the picked NEIGHBOR ROWS are engine-specific —
# but the properties that make a correct top-k are not. ``n_queries``
# anchors on data (one result group per query vector, none missing);
# the booleans assert exactly-k rows per query, per-query recall vs
# the exact brute-force top-k ≥ the same bound the standalone recall
# gates use, and cosine scores inside [-1, 1]. A red row now means the
# ANN pipeline actually broke — the old rows-only check (recorded by
# the driver as ``err: no_oracle``) could not see any of it.
_TOPK_GATE_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       TRUE AS all_k_rows,
       TRUE AS recall_ok,
       TRUE AS scores_in_unit
FROM embeddings WHERE vec_id < {_NQ}
"""


def _topk_property_gate(
    approx: DataFrame, exact: DataFrame, k: int, min_hits: int
) -> DataFrame:
    """Single-row gate over an approximate top-k result: group count,
    exactly-k-rows, recall ≥ min_hits vs ``exact``, scores in unit
    range. Aggregations only — the approx/exact plans keep their own
    (broadcast/bucketed) shapes."""
    per_q = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("similarity").alias("_lo"),
        F.max("similarity").alias("_hi"),
    )
    hits = (
        exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return (
        per_q.join(hits, "query_id", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.bool_and(F.col("_n") == k).alias("all_k_rows"),
            F.bool_and(
                F.coalesce("_h", F.lit(0)) >= min_hits
            ).alias("recall_ok"),
            F.bool_and(
                (F.col("_hi") <= 1.0 + 1e-9)
                & (F.col("_lo") >= -1.0 - 1e-9)
            ).alias("scores_in_unit"),
        )
    )


@query("similarity_topk_lsh", oracle=_TOPK_GATE_ORACLE)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane LSH top-k (OR-amplified candidates,
    exact scores), 32 tables × 5 bits — gated as a single-row property
    check (see ``_TOPK_GATE_ORACLE``): exactly k rows per query,
    recall@3 ≥ 2/3 vs exact brute force (measured 100% on the
    synthetic embeddings; 2/3 leaves fixture-drift margin, same bound
    as ``similarity_lsh_recall``), scores in unit range. The raw
    top-k plan is still what bench.py times (its own plan map keeps
    the operator's trend number separate from this gate)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    approx = S.topk_lsh(
        vecs, queries, dim=_DIM, k=_K, nbits=5, n_tables=32
    )
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    return _topk_property_gate(approx, exact, k=_K, min_hits=2)


@query("similarity_topk_ivf", oracle=_TOPK_GATE_ORACLE)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (16 inverted lists, probe 8) — single-row property
    gate like ``similarity_topk_lsh``: exactly k rows per query,
    recall@3 ≥ 1/3 vs exact (the ``similarity_ivf_recall`` bound —
    sampled non-kmeans centroids surface 1-2 of 3 true neighbors),
    scores in unit range."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    approx = S.topk_ivf(vecs, queries, k=_K, n_centroids=16, nprobe=8)
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    return _topk_property_gate(approx, exact, k=_K, min_hits=1)


# ANN recall gates: sketch-style oracle trick (plans/sketch_queries.py)
# — return per-query recall-in-bound booleans the oracle asserts as
# TRUE literals, turning "rows-only" ANN into a value-hash check.
_RECALL_ORACLE = f"""
SELECT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < {_NQ}
"""


def _recall_ok(
    exact: DataFrame, approx: DataFrame, queries: DataFrame, min_hits: int
) -> DataFrame:
    hits = (
        exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("_n_hit"))
    )
    base = queries.select(F.col("vec_id").alias("query_id"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce("_n_hit", F.lit(0)) >= min_hits).alias("recall_ok"),
    )


@query("similarity_lsh_recall", oracle=_RECALL_ORACLE)
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall@3 ≥ 2/3 per query vs exact brute force (measured
    3/3 at both fixture scales; 2/3 leaves seed-robust margin)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    approx = S.topk_lsh(vecs, queries, dim=_DIM, k=_K, nbits=5, n_tables=32)
    return _recall_ok(exact, approx, queries, min_hits=2)


@query("similarity_ivf_recall", oracle=_RECALL_ORACLE)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@3 ≥ 1/3 per query vs exact brute force — the probe
    of 8/16 lists must surface at least one true neighbor everywhere
    (measured min 1-2 of 3 with sampled, non-kmeans centroids)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    approx = S.topk_ivf(vecs, queries, k=_K, n_centroids=16, nprobe=8)
    return _recall_ok(exact, approx, queries, min_hits=1)


_EMB_DUP_ORACLE = f"""
WITH vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_dcos('a.v', 'b.v')} AS similarity
FROM vd a JOIN vd b ON a.vec_id < b.vec_id
WHERE {_dcos('a.v', 'b.v')} >= 0.35
"""


@query("dedup_embedding_cosine", oracle=_EMB_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine ≥ 0.35 (threshold chosen to yield a few hundred pairs in the synthetic near-orthogonal embeddings).

    Exact (unbucketed) flavor so the oracle can replay it; the LSH
    path is exercised by similarity_topk_lsh."""
    return S.embedding_dup_pairs(_vecs(spark, sf_dir), threshold=0.35, dim=None)


# --- embedding maintenance ops: quantize, centroids -----------------------

_QUANT_ORACLE = """
WITH vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM vd
)
SELECT vec_id,
       scale,
       to_json(list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)))
         AS q
FROM s
"""


@query("embedding_quantize_int8", oracle=_QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding (the 4×
    compression step before an ANN index ships to serving). Pure
    ``transform`` expressions — elementwise, no shuffle, no UDF;
    round-half-up via floor(y+0.5) so both engines agree bitwise."""
    from convert_parquet_to_csv_spark.functions.vectors import (
        quantize_int8,
        quantize_scale,
    )

    vecs = _vecs(spark, sf_dir)
    # int8 codes ship as a JSON string: raw ARRAY cells crash the
    # driver's pandas canonicalizer, and int-array JSON renders are
    # byte-identical across engines (unlike doubles).
    return vecs.select(
        "vec_id",
        quantize_scale("embedding").alias("scale"),
        F.to_json(quantize_int8("embedding")).alias("q"),
    )


# Fixed-point accumulation: floor(x·1e9) longs sum exactly and
# order-independently (double SUM would drift in the last ulp per
# engine/partition order). The gated projection keeps the exact
# per-dimension SUM as a JSON-serialized bigint array — raw ARRAY
# columns crash the driver's pandas canonicalizer (r1 lesson), and
# JSON *double* rendering differs across engines, so the one safe
# wire form is integers-in-JSON. mean = fx/n/1e9, derivable exactly.
_CENTROID_ORACLE = """
WITH flat AS (
  SELECT label, u.pos AS pos, u.fx AS fx FROM (
    SELECT label,
           unnest(list_transform(embedding, (x, i) -> struct_pack(
               pos := i,
               fx := CAST(floor(CAST(x AS DOUBLE) * 1000000000) AS BIGINT)
           ))) AS u
    FROM embeddings)
), agg AS (
  SELECT label, pos, CAST(SUM(fx) AS BIGINT) AS sfx, COUNT(*) AS n
  FROM flat GROUP BY label, pos
)
SELECT label,
       to_json(list(sfx ORDER BY pos)) AS centroid_fx,
       CAST(MAX(n) AS BIGINT) AS n_vectors
FROM agg
GROUP BY label
"""


@query("embedding_centroids", oracle=_CENTROID_ORACLE)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding — the k-means/IVF centroid update step
    as one declarative plan: posexplode to (label, pos, val) long
    format, one (label, pos) aggregation (partial map-side, dim×labels
    output rows), then re-assemble ordered arrays. Fixed-point long
    accumulation keeps the float sum order-independent so the oracle
    hash-matches exactly."""
    vecs = _vecs(spark, sf_dir)
    flat = vecs.select(
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "label",
        # DuckDB's WITH ORDINALITY is 1-based; match it.
        (F.col("pos") + 1).alias("pos"),
        F.floor(F.col("val").cast("double") * F.lit(1_000_000_000))
        .cast("long")
        .alias("fx"),
    )
    agg = flat.groupBy("label", "pos").agg(
        F.sum("fx").alias("sfx"),
        F.count("*").alias("_n"),
    )
    return agg.groupBy("label").agg(
        F.to_json(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("sfx")))
                ),
                lambda s: s["sfx"],
            )
        ).alias("centroid_fx"),
        F.max("_n").cast("bigint").alias("n_vectors"),
    )


@query("similarity_ivf_kmeans_recall", oracle=_RECALL_ORACLE)
def similarity_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with 5 spherical-Lloyd refinement rounds
    (operators/similarity.kmeans_refine_centroids): recall@3 ≥ 1/3 per
    query at probe 8/16 (measured min 1, typically 2-3, at all fixture
    scales). Deterministic end to end — fixed-point centroid sums and
    cosine tie-breaks make the trained index a pure function of the
    data."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    approx = S.topk_ivf(
        vecs, queries, k=_K, n_centroids=16, nprobe=8, kmeans_iters=5
    )
    return _recall_ok(exact, approx, queries, min_hits=1)


# --- mapInArrow zero-copy batch path --------------------------------------

# Integer-exact kernel (see functions/vectors.arrow_vector_stats):
# float32→float64 upcast is exact, one multiply and the floor are
# exactly rounded, and the int64 sum is order-free — so the Arrow-path
# result is bit-identical to DuckDB's sequential list fold.
_ARROW_STATS_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       CAST(list_sum(list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                   AS BIGINT))) AS BIGINT) AS checksum
FROM embeddings
"""


@query("arrow_vector_checksum", oracle=_ARROW_STATS_ORACLE)
def arrow_vector_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dim + integer checksum through ``mapInArrow`` — the
    zero-copy RecordBatch path for numeric kernels that outgrow Column
    expressions (BLAS/FAISS-style libraries want the contiguous float
    buffer). The numpy kernel reads the list column's values buffer
    without copying and reduces per-vector via ``reduceat``; Arrow
    batch size bounds memory per task. Embarrassingly parallel — no
    shuffle anywhere."""
    from convert_parquet_to_csv_spark.functions.vectors import (
        arrow_vector_stats,
    )

    return arrow_vector_stats(_vecs(spark, sf_dir))


# --- sparse tf-idf cosine pairs (inverted-index join) ---------------------

_SPARSE_COS_ORACLE = r"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           t -> t != '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words
       GROUP BY doc_id, term),
n AS (SELECT COUNT(*) AS n_corpus FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
keep AS (
  SELECT dfreq.term, dfreq.df, n.n_corpus FROM dfreq CROSS JOIN n
  WHERE dfreq.df >= 2 AND dfreq.df * 10 <= n.n_corpus),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * (keep.n_corpus // keep.df) AS BIGINT) AS w
  FROM tf JOIN keep ON tf.term = keep.term),
norm2 AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS n2
          FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(SUM(a.w * b.w) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
cos AS (
  SELECT d1, d2, dot,
         CAST(dot AS DOUBLE)
           / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE)) AS cosine
  FROM dots JOIN norm2 x ON d1 = x.doc_id
            JOIN norm2 y ON d2 = y.doc_id),
ranked AS (
  SELECT d1, d2, dot, cosine,
         CAST(row_number() OVER (
           PARTITION BY d1 ORDER BY cosine DESC, d2 ASC) AS INT) AS rk
  FROM cos)
SELECT d1, d2, dot, cosine, rk FROM ranked WHERE rk <= 3
"""


@query("sparse_cosine_topk_pairs", oracle=_SPARSE_COS_ORACLE)
def sparse_cosine_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-similar document pairs per doc under sparse tf-idf
    cosine — the inverted-index path (no embeddings): integer
    weights keep every sum exact, stop/rare-term pruning bounds the
    posting-list self-join (see operators.similarity.
    sparse_cosine_topk_pairs for the full scale analysis)."""
    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    )
    return S.sparse_cosine_topk_pairs(docs, k=3)


# --- inter-label centroid distance matrix ---------------------------------

# d(a,b) from exact integers: per-dimension fixed-point sums sfx
# (the embedding_centroids convention), cross-multiplied difference
# sfx_a·n_b − sfx_b·n_a so no division happens before the squared
# sum (DECIMAL(38,0) vs HUGEINT — diff² ≈ 10^29), one shared
# sqrt+divide at the end.
_CENTROID_DIST_ORACLE = """
WITH flat AS (
  SELECT label, u.pos AS pos, u.fx AS fx FROM (
    SELECT label,
           unnest(list_transform(embedding, (x, i) -> struct_pack(
               pos := i,
               fx := CAST(floor(CAST(x AS DOUBLE) * 1000000000)
                          AS BIGINT)
           ))) AS u
    FROM embeddings)),
agg AS (
  SELECT label, pos, SUM(fx) AS sfx, COUNT(*) AS n
  FROM flat GROUP BY label, pos),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         MAX(a.n) AS n_a, MAX(b.n) AS n_b,
         SUM(CAST(a.sfx * b.n - b.sfx * a.n AS HUGEINT)
             * CAST(a.sfx * b.n - b.sfx * a.n AS HUGEINT)) AS num
  FROM agg a JOIN agg b ON a.pos = b.pos AND a.label < b.label
  GROUP BY a.label, b.label)
SELECT label_a, label_b,
       sqrt(CAST(num AS DOUBLE))
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            * 1000000000.0) AS centroid_dist
FROM pairs
"""


@query("label_centroid_distances", oracle=_CENTROID_DIST_ORACLE)
def label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance matrix between per-label mean embeddings —
    the class-separation audit (which labels are confusable, is the
    embedding space collapsing) run entirely on the long-format
    (label, pos) sums, never materializing centroid arrays: the
    pairwise join is labels²·dims rows of integers. Exactness above
    the oracle; extends embedding_centroids from the means to their
    geometry."""
    vecs = _vecs(spark, sf_dir)
    vecs.createOrReplaceTempView("embeddings")
    return spark.sql(
        """
        WITH flat AS (
          SELECT label, pos + 1 AS pos,
                 CAST(floor(CAST(val AS DOUBLE) * 1000000000)
                      AS BIGINT) AS fx
          FROM embeddings
          LATERAL VIEW posexplode(embedding) AS pos, val),
        agg AS (
          SELECT label, pos, SUM(fx) AS sfx, COUNT(*) AS n
          FROM flat GROUP BY label, pos),
        pairs AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 MAX(a.n) AS n_a, MAX(b.n) AS n_b,
                 SUM(CAST(a.sfx * b.n - b.sfx * a.n AS DECIMAL(38,0))
                     * CAST(a.sfx * b.n - b.sfx * a.n
                            AS DECIMAL(38,0))) AS num
          FROM agg a JOIN agg b
            ON a.pos = b.pos AND a.label < b.label
          GROUP BY a.label, b.label)
        SELECT label_a, label_b,
               sqrt(CAST(num AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * 1000000000.0) AS centroid_dist
        FROM pairs
        """
    )


# --- power-iteration first principal component ----------------------------

# Exact-arithmetic power iteration: every matvec sum runs over
# integers (DECIMAL(38,0) vs HUGEINT), every re-quantization is
# sign·((abs·2^20) trunc-div max) — verified trunc-div parity between
# Spark `div` and DuckDB `//` — so TWO full iterations of an
# iterative linear-algebra algorithm hash-match the oracle exactly,
# with no tolerance anywhere. Magnitude audit (sf0.1): fx ≤ 2^30,
# centered c = n·fx − S ≤ 2^47, y = Σ_64 c·v ≤ 2^72, abs(y)·2^20 ≤
# 2^92, z = Σ_50k c·y′ ≤ 2^87 — all inside DECIMAL(38)/HUGEINT.
_PC1_ORACLE = """
WITH flat AS (
  SELECT vec_id, u.pos AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000000) AS BIGINT) AS fx
  FROM (SELECT vec_id,
               unnest(list_transform(embedding, (x, i) ->
                   struct_pack(pos := i, x := x))) AS u
        FROM embeddings)),
st AS (
  SELECT pos, SUM(fx) AS s, COUNT(*) AS n FROM flat GROUP BY pos),
c AS (
  SELECT f.vec_id, f.pos,
         CAST(st.n AS HUGEINT) * f.fx - st.s AS c
  FROM flat f JOIN st ON f.pos = st.pos),
y1 AS (
  SELECT vec_id, SUM(c) AS y FROM c GROUP BY vec_id),
my1 AS (SELECT MAX(abs(y)) AS m FROM y1),
yq1 AS (
  SELECT vec_id,
         (CASE WHEN y < 0 THEN -1 ELSE 1 END)
           * ((abs(y) * 1048576) // (SELECT m FROM my1)) AS yq
  FROM y1),
z1 AS (
  SELECT c.pos, SUM(c.c * yq1.yq) AS z
  FROM c JOIN yq1 ON c.vec_id = yq1.vec_id GROUP BY c.pos),
mz1 AS (SELECT MAX(abs(z)) AS m FROM z1),
v1 AS (
  SELECT pos,
         (CASE WHEN z < 0 THEN -1 ELSE 1 END)
           * ((abs(z) * 1048576) // (SELECT m FROM mz1)) AS vq
  FROM z1),
y2 AS (
  SELECT c.vec_id, SUM(c.c * v1.vq) AS y
  FROM c JOIN v1 ON c.pos = v1.pos GROUP BY c.vec_id),
my2 AS (SELECT MAX(abs(y)) AS m FROM y2),
yq2 AS (
  SELECT vec_id,
         (CASE WHEN y < 0 THEN -1 ELSE 1 END)
           * ((abs(y) * 1048576) // (SELECT m FROM my2)) AS yq
  FROM y2),
z2 AS (
  SELECT c.pos, SUM(c.c * yq2.yq) AS z
  FROM c JOIN yq2 ON c.vec_id = yq2.vec_id GROUP BY c.pos),
mz2 AS (SELECT MAX(abs(z)) AS m FROM z2),
v2 AS (
  SELECT pos,
         (CASE WHEN z < 0 THEN -1 ELSE 1 END)
           * ((abs(z) * 1048576) // (SELECT m FROM mz2)) AS vq
  FROM z2)
SELECT CAST(pos - 1 AS INT) AS pos, CAST(vq AS BIGINT) AS v_q FROM v2
"""


def _requant(df: DataFrame, val: str, key: str) -> DataFrame:
    """sign(val)·((abs(val)·2^20) div max(abs(val))) → BIGINT in
    [-2^20, 2^20]. Trunc-div of non-negative integers — exact and
    engine-portable (verified: Spark ``div`` and DuckDB ``//`` both
    truncate toward zero)."""
    m = df.agg(F.max(F.abs(F.col(val))).alias("_m"))
    # ADVICE r3: _m = 0 (all-zero matvec result — degenerate input)
    # must fail LOUDLY, not NULL-poison via Spark's div-by-zero→NULL
    # while the DuckDB oracle diverges its own way.
    q = F.when(F.col(val) < 0, -1).otherwise(1) * F.expr(
        f"(abs({val}) * 1048576) div _m"
    )
    guarded = F.when(F.col("_m") > 0, q).otherwise(
        F.raise_error(
            F.lit(
                "_requant: max(abs(value)) is 0 — degenerate "
                "all-zero vector, cannot renormalize"
            )
        ).cast("long")
    )
    return (
        df.crossJoin(F.broadcast(m))
        .select(key, guarded.alias("q"))
    )


@query("embedding_power_iteration_pc1", oracle=_PC1_ORACLE)
def embedding_power_iteration_pc1(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First principal component of the embedding cloud by TWO power
    iterations on the centered Gram matrix — the dominant direction a
    drift/collapse audit watches, and the template for any iterative
    mat-vec algorithm on long-format vectors (PageRank's linear-
    algebra cousin). v ← Cᵀ(Cv) per iteration: each matvec is one
    join + one integer-sum groupBy on the (vec_id, pos, value) long
    table; the 64-row vector side is BROADCAST, so the big side never
    shuffles — at 100 TB each iteration is two broadcast-join scans.

    Determinism device (new to this family): the entire iteration —
    quantize (floor ×1e9), center (multiply-through: c = n·fx − S, no
    division), matvec (DECIMAL(38,0) sums), re-normalize
    (sign·trunc-div by the exact integer max) — stays in integer
    arithmetic, so an ITERATIVE algorithm's output hash-matches the
    oracle with zero tolerance. Sign convention inherited from v₀ =
    ones; two iterations are gated (convergence is the caller's
    knob, determinism holds at any count).

    Partitioning reuse (r5): ``c`` is persisted PRE-PARTITIONED on
    vec_id, so every per-iteration ``groupBy(vec_id)`` and the
    ``join(yq, vec_id)`` consume that one upfront exchange instead of
    re-shuffling the n·dim long table twice per iteration, and y/z
    are persisted because each feeds _requant twice (max aggregate +
    quantized projection). Measured at sf0.1, cache-cleared min-of-2:
    3.98 → 3.3 s — modest, because sf0.1 has only 2000 vectors
    (128k long rows) and the residual ~3 s is per-job scheduling and
    codegen across the ~8 sequential broadcast jobs, not data work;
    the shuffle-count fix is what matters at real scale. A
    column-wise form (dim fixed sum expressions, zero joins) was
    ALSO tried and measured 11-13 s — 64-deep DECIMAL(38,0)
    expression chains fall out of whole-stage codegen into
    interpreted decimal math; don't resurrect it."""
    flat = _vecs(spark, sf_dir).select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("pos", "x"),
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * 1000000000)
        .cast("bigint")
        .alias("fx"),
    )
    st = flat.groupBy("pos").agg(
        F.sum("fx").alias("s"), F.count(F.lit(1)).alias("n")
    )
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    c = (
        flat.join(F.broadcast(st), "pos")
        .select(
            "vec_id",
            "pos",
            (F.col("n") * F.col("fx") - F.col("s"))
            .cast("decimal(38,0)")
            .alias("c"),
        )
        .repartition(nshuf, "vec_id")
        .persist()
    )
    # v0 = ones: first matvec is the row sum. Each y/z feeds _requant
    # TWICE (its max aggregate and the quantized projection) — persist
    # them so neither matvec re-runs (y is one row per vector, z one
    # per dimension; both trivially cacheable at any scale).
    #
    # Cache contract (ADVICE r5): EVERY iteration's y/z persist stays
    # pinned until the caller's clearCache — deliberately. The whole
    # plan is lazy (no action until the caller's), so no iteration's
    # table is ever "superseded": iteration i's y feeds iteration
    # i+1's z through _requant's two references at action time, and a
    # build-time unpersist would cancel the cache BEFORE its first
    # use, re-running the matvec chain 2^iters times. Memory grows
    # linearly with the convergence knob but each pinned table is one
    # row per vector (y) or per dimension (z) — bytes, at any corpus
    # scale.
    y = c.groupBy("vec_id").agg(F.sum("c").alias("y")).persist()
    for _ in range(2):
        yq = _requant(y, "y", "vec_id").withColumnRenamed("q", "yq")
        z = (
            c.join(yq, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.col("c") * F.col("yq")).alias("z"))
            .persist()
        )
        v = _requant(z, "z", "pos").withColumnRenamed("q", "vq")
        y = (
            c.join(F.broadcast(v), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("c") * F.col("vq")).alias("y"))
            .persist()
        )
    # The loop computes one matvec past v2; return v (the loop's last
    # re-quantized vector) — y is discarded.
    return v.select(
        F.col("pos").cast("int").alias("pos"),
        F.col("vq").cast("bigint").alias("v_q"),
    )


# --- sparse matmul: doc-topic projection ----------------------------------

_TOPIC_ORACLE = """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(trim(text)), '\\s+'),
             t -> t != '')) AS tok
    FROM documents) GROUP BY doc_id, tok
), loads AS (
  SELECT tok,
         CAST('0x' || substring(md5(tok || '|0'), 1, 2) AS INT) - 128 AS l0,
         CAST('0x' || substring(md5(tok || '|1'), 1, 2) AS INT) - 128 AS l1,
         CAST('0x' || substring(md5(tok || '|2'), 1, 2) AS INT) - 128 AS l2,
         CAST('0x' || substring(md5(tok || '|3'), 1, 2) AS INT) - 128 AS l3,
         CAST('0x' || substring(md5(tok || '|4'), 1, 2) AS INT) - 128 AS l4
  FROM (SELECT DISTINCT tok FROM tf)
), scores AS (
  SELECT t.doc_id,
         SUM(t.tf * l.l0) AS s0, SUM(t.tf * l.l1) AS s1,
         SUM(t.tf * l.l2) AS s2, SUM(t.tf * l.l3) AS s3,
         SUM(t.tf * l.l4) AS s4
  FROM tf t JOIN loads l ON t.tok = l.tok GROUP BY t.doc_id
), top AS (
  SELECT doc_id,
         CASE greatest(s0, s1, s2, s3, s4)
           WHEN s0 THEN 0 WHEN s1 THEN 1 WHEN s2 THEN 2
           WHEN s3 THEN 3 ELSE 4 END AS top_topic,
         greatest(s0, s1, s2, s3, s4) AS best
  FROM scores
)
SELECT CAST(top_topic AS INT) AS top_topic,
       COUNT(*) AS n_docs,
       CAST(SUM(best) AS BIGINT) AS total_best_score
FROM top GROUP BY top_topic
"""


@query("doc_topic_projection", oracle=_TOPIC_ORACLE)
def doc_topic_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse matrix × dense matrix: term-frequency vectors projected
    onto a 5-topic loading matrix (the LSA/classifier-projection
    shape — same plan serves real learned loadings). The loading
    matrix is md5-derived per (term, topic) so both engines own an
    identical matrix without shipping one.

    Scale shape: tf is the standard (doc, term) aggregate; the
    loading matrix has one row PER DISTINCT TERM (vocab-sized →
    broadcast), so the projection is a map-side join + one per-doc
    aggregate — the fact stream shuffles once on doc_id, never on
    the dense side. All integer products/sums; argmax ties resolve
    to the lowest topic id via CASE order in both engines."""
    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    )
    from convert_parquet_to_csv_spark.functions.text import tokens

    toks = docs.select(
        "doc_id",
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )

    def loading(t: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("tok"), F.lit(f"|{t}"))), 1, 2
                ),
                16, 10,
            ).cast("int")
            - 128
        ).alias(f"l{t}")

    loads = tf.select("tok").distinct().select(
        "tok", *[loading(t) for t in range(5)]
    )
    scores = (
        tf.join(F.broadcast(loads), "tok")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.col("tf") * F.col(f"l{t}")).alias(f"s{t}")
                for t in range(5)
            ]
        )
    )
    best = F.greatest(*[F.col(f"s{t}") for t in range(5)])
    top_topic = (
        F.when(best == F.col("s0"), 0)
        .when(best == F.col("s1"), 1)
        .when(best == F.col("s2"), 2)
        .when(best == F.col("s3"), 3)
        .otherwise(4)
    )
    top = scores.select(
        "doc_id",
        top_topic.cast("int").alias("top_topic"),
        best.alias("best"),
    )
    return top.groupBy("top_topic").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("best").cast("bigint").alias("total_best_score"),
    )


# --------------------------------------------------------------------------
# SemDeDup gate (r6; past the gate prefix — r7 rotation backlog)
# --------------------------------------------------------------------------

# The survivor set depends on the k-means clustering (not
# SQL-replayable), but two defining properties ARE: soundness — every
# within-cluster pair is a true cosine pair, so the semdedup drop set
# must be a SUBSET of the exact all-pairs drop set (which DuckDB
# computes exactly) — and a recall floor against that same exact drop
# count (measured 0.34/0.34/0.43 of exact drops at sf0.001/0.01/0.1
# with 16 clusters on the near-orthogonal synthetic embeddings; 0.25
# leaves fixture-drift margin). n_vectors and n_dropped_exact anchor
# the gate on real data.
_SEMDEDUP_THRESH = 0.35
_SEMDEDUP_GATE_ORACLE = f"""
WITH vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), drops AS (
  SELECT DISTINCT b.vec_id AS id_b
  FROM vd a JOIN vd b ON a.vec_id < b.vec_id
  WHERE {_dcos('a.v', 'b.v')} >= {_SEMDEDUP_THRESH}
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM vd) AS n_vectors,
       (SELECT CAST(count(*) AS BIGINT) FROM drops) AS n_dropped_exact,
       TRUE AS dropped_is_subset,
       TRUE AS recall_floor_ok
"""


@query("dedup_semdedup_clustered", oracle=_SEMDEDUP_GATE_ORACLE)
def dedup_semdedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means-bucketed semantic dedup —
    the scale path next to dedup_embedding_cosine's exact all-pairs
    flavor. Single-row property gate: the cluster-bucketed drop set
    must be a subset of the exact cosine drop set (soundness) and
    recover ≥ 25% of it at 16 clusters (measured 34-43% on the
    fixtures); n_vectors / n_dropped_exact anchor the row on data."""
    vecs = _vecs(spark, sf_dir)
    survivors = S.semdedup(
        vecs, threshold=_SEMDEDUP_THRESH, n_clusters=16, n_iters=2
    )
    sem_drops = vecs.join(
        survivors.select("vec_id"), "vec_id", "left_anti"
    ).select("vec_id")
    exact_drops = (
        S.embedding_dup_pairs(vecs, threshold=_SEMDEDUP_THRESH, dim=None)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    # both referenced twice (counts + subset anti-join)
    sem_drops = sem_drops.persist()
    exact_drops = exact_drops.persist()
    n_vec = vecs.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_exact = exact_drops.agg(
        F.count(F.lit(1)).alias("n_dropped_exact")
    )
    n_sem = sem_drops.agg(F.count(F.lit(1)).alias("_n_sem"))
    n_outside = sem_drops.join(exact_drops, "vec_id", "left_anti").agg(
        F.count(F.lit(1)).alias("_n_outside")
    )
    return (
        n_vec.crossJoin(n_exact)
        .crossJoin(n_sem)
        .crossJoin(n_outside)
        .select(
            "n_vectors",
            "n_dropped_exact",
            (F.col("_n_outside") == 0).alias("dropped_is_subset"),
            (
                F.col("_n_sem").cast("double")
                >= 0.25 * F.col("n_dropped_exact").cast("double")
            ).alias("recall_floor_ok"),
        )
    )


@query("similarity_topk_pq", oracle=_TOPK_GATE_ORACLE)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/similarity.
    topk_pq_adc; Jégou et al. 2011): the corpus compresses to m
    sub-space codes per vector, queries stay full-precision, and
    similarity is the exact cosine against each vector's codebook
    reconstruction, assembled from broadcast lookup-table pieces —
    the memory-bound billion-scale ANN layout (m·log₂(codes) bits
    per vector vs 64 floats; compose with the IVF coarse quantizer
    for IVFADC). Same single-row property gate as the LSH/IVF
    flavors: exactly k rows per query, recall@3 ≥ 1/3 vs exact
    brute force (measured m=32/codes=64: 10/15 hits at sf0.01,
    11/15 at sf0.001, min 1 per query — PQ trades recall per byte,
    and the near-uniform synthetic unit vectors are its hard case),
    scores in unit range (exact cosines of reconstructions, so
    Cauchy-Schwarz bounds them by construction)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    approx = S.topk_pq_adc(
        vecs, queries, dim=_DIM, k=_K, m=32, codes=64, kmeans_iters=1
    )
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    return _topk_property_gate(approx, exact, k=_K, min_hits=1)


@query("similarity_topk_ivfadc", oracle=_TOPK_GATE_ORACLE)
def similarity_topk_ivfadc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVFADC top-k (operators/similarity.topk_ivfadc; Jégou et al.
    2011 §V): IVF coarse quantizer prunes to nprobe lists, PQ codes
    encode the RESIDUALS v − c(v), and similarity is the exact cosine
    against the two-level reconstruction — numerator and norm both
    assembled from broadcast pieces (the query-independent
    ⟨c_sub, r⟩ cross table is the §V trick). The composed
    billion-scale layout the topk_pq docstring promises: probe cost
    |corpus|·nprobe/lists code rows, memory m·log₂(codes) bits per
    vector. Property gate: exactly k rows per query, recall@3 ≥ 1/3
    vs exact brute force (measured 16 lists/probe 8/m=32/codes=64:
    10/15 at sf0.01 — residual PQ beats raw-PQ's recall at equal
    code budget on the clustered fixture — min 1 per query), scores
    in unit range (exact reconstruction cosines)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    approx = S.topk_ivfadc(
        vecs,
        queries,
        dim=_DIM,
        k=_K,
        n_centroids=16,
        nprobe=8,
        m=32,
        codes=64,
        kmeans_iters=1,
    )
    exact = S.topk_bruteforce(vecs, queries, k=_K)
    return _topk_property_gate(approx, exact, k=_K, min_hits=1)


# --------------------------------------------------------------------------
# r8 wave 3: Johnson-Lindenstrauss random projection (deterministic
# Rademacher signs, exact-integer components). Day-one gated.
# --------------------------------------------------------------------------

_JL_ORACLE = """
WITH sg AS (
  SELECT CAST(j AS INT) AS j,
         CAST(1 - 2 * (ascii(substr(md5('0_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s0,
         CAST(1 - 2 * (ascii(substr(md5('1_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s1,
         CAST(1 - 2 * (ascii(substr(md5('2_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s2,
         CAST(1 - 2 * (ascii(substr(md5('3_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s3,
         CAST(1 - 2 * (ascii(substr(md5('4_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s4,
         CAST(1 - 2 * (ascii(substr(md5('5_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s5,
         CAST(1 - 2 * (ascii(substr(md5('6_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s6,
         CAST(1 - 2 * (ascii(substr(md5('7_' || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT) AS s7
  FROM range(1, 65) t(j)
), ex AS (
  SELECT vec_id, CAST(j AS INT) AS j,
         CAST(floor(CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS vi
  FROM embeddings, unnest(range(1, 65)) AS t(j)
)
SELECT vec_id,
       CAST(sum(s0 * vi) AS BIGINT) AS c0,
       CAST(sum(s1 * vi) AS BIGINT) AS c1,
       CAST(sum(s2 * vi) AS BIGINT) AS c2,
       CAST(sum(s3 * vi) AS BIGINT) AS c3,
       CAST(sum(s4 * vi) AS BIGINT) AS c4,
       CAST(sum(s5 * vi) AS BIGINT) AS c5,
       CAST(sum(s6 * vi) AS BIGINT) AS c6,
       CAST(sum(s7 * vi) AS BIGINT) AS c7
FROM ex JOIN sg USING (j)
GROUP BY vec_id
"""


@query("embedding_jl_projection", oracle=_JL_ORACLE)
def embedding_jl_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """64-d float embeddings projected to 8 exact-integer components
    (operators/similarity.jl_project; Achlioptas 2003 Rademacher
    JL): c_i = sum_j sign(i,j) * floor(v_j * 1e6) with md5-bit signs —
    distance-preserving dimensionality reduction whose output is
    bit-reproducible across engines and runs, the audit property a
    Gaussian projection cannot offer. Sign matrix = a 64-row
    broadcast built from a range; one posexplode + broadcast join +
    per-id map-side-combinable groupBy — a single narrow shuffle —
    with degenerate (NULL/empty) vectors kept via the phantom NULL
    element device (a NULL-valued entry keeps the id in the explode
    and aggregates to NULL components; no spine join at all — the
    plan-audit case for this query pins exactly that; ADVICE r8
    docstring fix)."""
    return S.jl_project(_vecs(spark, sf_dir), dim=64, out_dims=8)


# --- semantic (embedding-space) decontamination (r9) -----------------------

_SDECON_MOD = 50     # benchmark = vec_id % 50 == 1 (2% of the table)
_SDECON_TAU = 0.30   # fixture-tuned: mixes true/false flags at sf0.01


def _sdecon_cos(a: str, b: str) -> str:
    """Cosine with the operator's zero-denominator guard (0.0, not
    NaN — functions/vectors.cosine_similarity contract)."""
    denom = (
        f"(sqrt({_DDOT.format(a=a, b=a)})"
        f" * sqrt({_DDOT.format(a=b, b=b)}))"
    )
    return (
        f"CASE WHEN {denom} > 0"
        f" THEN {_DDOT.format(a=a, b=b)} / {denom}"
        f" ELSE 0.0 END"
    )


_SDECON_ORACLE = f"""
WITH vd AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bench AS (
  SELECT DISTINCT v AS bv FROM vd WHERE vec_id % {_SDECON_MOD} = 1
),
scored AS (
  SELECT vd.vec_id,
         max({_sdecon_cos('vd.v', 'bench.bv')}) AS max_benchmark_sim
  FROM vd LEFT JOIN bench ON TRUE
  GROUP BY vd.vec_id
)
SELECT vec_id, max_benchmark_sim,
       COALESCE(max_benchmark_sim >= {_SDECON_TAU}, FALSE)
         AS contaminated
FROM scored
"""


@query("decontaminate_semantic", oracle=_SDECON_ORACLE)
def decontaminate_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space decontamination
    (operators/curation.flag_contaminated_semantic): flag corpus
    vectors whose max cosine against a held-out benchmark embedding
    set reaches τ — the semantic complement of the n-gram
    decontaminators (catches paraphrased benchmark leakage that
    shares no surface 13-gram). Benchmark = vec_id % 50 == 1 carved
    from the table (the _DECON device — benchmark members self-match
    at cos 1.0, exercising the flagged branch at every SF); the
    benchmark folds to a 1-row broadcast array and the corpus
    STREAMS through one map-side array_max(transform(...)) scoring
    projection — zero corpus shuffles."""
    from convert_parquet_to_csv_spark.operators.curation import (
        flag_contaminated_semantic,
    )

    vecs = _vecs(spark, sf_dir)
    bench = vecs.filter(
        F.col("vec_id") % _SDECON_MOD == F.lit(1)
    )
    return flag_contaminated_semantic(
        vecs, bench, threshold=_SDECON_TAU
    )

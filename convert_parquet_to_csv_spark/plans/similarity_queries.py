"""Driver-checked queries: similarity search over the embeddings table.

The brute-force oracle reproduces Spark's arithmetic exactly:
float32→float64 element casts, left-to-right float64 accumulation,
cosine = dot/(√dot_aa·√dot_bb). Verified bitwise-identical against
DuckDB's ``list_dot_product`` (same sequential order) — so even the
top-k *membership* agrees and no rounding is needed. (DuckDB's own
``list_cosine_similarity`` is NOT used: it clamps differently.)

LSH / IVF variants depend on Spark-side hash signatures → rows-only.
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


@query("similarity_topk_lsh")  # rows-only: Spark-side hyperplane hashes
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k (bucketed candidates, exact scores)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    return S.topk_lsh(vecs, queries, dim=_DIM, k=_K, nbits=8)


@query("similarity_topk_ivf")  # rows-only: centroid sample is hash-seeded
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: 16 inverted lists, probe 4."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < _NQ)
    return S.topk_ivf(vecs, queries, k=_K, n_centroids=16, nprobe=4)


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

"""Driver-checked queries: multimodal binary-column pipeline.

``multimodal_stats`` has a full DuckDB oracle (binary payloads are
deterministic UTF-8 encodings, so octet arithmetic is replayable in
SQL). Feature extraction goes through mapInPandas with a stubbed
decoder → rows-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import multimodal as M
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    return M.media_table_from_documents(docs)


_STATS_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
         octet_length(encode(coalesce(text, ''))) AS n_bytes
  FROM documents
)
SELECT kind,
       COUNT(*) AS n_items,
       SUM(n_bytes) AS total_bytes,
       MAX(n_bytes) AS max_bytes
FROM media GROUP BY kind ORDER BY kind
"""


@query("multimodal_stats", oracle=_STATS_ORACLE)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind media byte stats over the typed binary table."""
    return M.media_stats(_media(spark, sf_dir))


@query("multimodal_features")  # rows-only: mapInPandas stub decoder
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (stub decoder, real plumbing)."""
    feats = M.extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "kind", F.size("feature").alias("feature_dim")
    ).orderBy("media_id")

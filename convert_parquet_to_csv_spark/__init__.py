"""convert_parquet_to_csv_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the full capability surface of the reference
repo ``anyamemensah/convert-parquet-to-csv`` (a Parquet→CSV conversion
benchmark harness; see /root/reference and SURVEY.md), and extends it
with the operators a large-scale training-data pipeline needs:
deduplication, similarity search, text analysis, multimodal column
plumbing, and structured streaming.

Design principles (SURVEY.md §7.0):

- Everything is a lazy ``DataFrame`` logical plan; Catalyst picks the
  physical strategy (pushdown, pruning, AQE).
- Built-in ``pyspark.sql.functions`` everywhere; Pandas UDFs only where
  built-ins genuinely cannot express the semantics (SimHash bit packing,
  multimodal decode).
- No ``collect()`` in any data path; driver-side lists only for tiny
  manifests, mirroring the reference's own driver-side orchestration.
"""

from convert_parquet_to_csv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

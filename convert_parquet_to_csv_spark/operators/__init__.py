"""Relational + data-pipeline operators built on the DataFrame API."""

from convert_parquet_to_csv_spark.operators.sample import sample_exact_n

__all__ = ["sample_exact_n"]

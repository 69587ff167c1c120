"""Relational + data-pipeline operators built on the DataFrame API."""

from convert_parquet_to_csv_spark.operators.asof import asof_join
from convert_parquet_to_csv_spark.operators.graph import connected_components
from convert_parquet_to_csv_spark.operators.rangejoin import interval_join
from convert_parquet_to_csv_spark.operators.sample import (
    sample_exact_n,
    sample_stratified_exact_n,
)
from convert_parquet_to_csv_spark.operators.scale import (
    read_table,
    salted_join,
    write_bucketed,
)

__all__ = [
    "asof_join",
    "connected_components",
    "interval_join",
    "read_table",
    "salted_join",
    "sample_exact_n",
    "sample_stratified_exact_n",
    "write_bucketed",
]

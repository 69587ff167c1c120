"""Sources & sinks: Parquet/CSV readers and writers."""

from convert_parquet_to_csv_spark.sources.io_ops import (
    convert_parquet_to_csv,
    read_csv,
    read_parquet,
    read_parquet_merged,
    read_parquet_nanos_ts,
    write_csv,
    write_parquet,
)

__all__ = [
    "convert_parquet_to_csv",
    "read_csv",
    "read_parquet",
    "read_parquet_merged",
    "read_parquet_nanos_ts",
    "write_csv",
    "write_parquet",
]

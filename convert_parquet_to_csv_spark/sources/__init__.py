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
from convert_parquet_to_csv_spark.sources.kafka_shape import (
    parse_kafka_records,
    read_kafka,
    read_kafka_dump,
    to_kafka_records,
    write_kafka_dump,
)

__all__ = [
    "convert_parquet_to_csv",
    "parse_kafka_records",
    "read_csv",
    "read_kafka",
    "read_kafka_dump",
    "read_parquet",
    "read_parquet_merged",
    "read_parquet_nanos_ts",
    "to_kafka_records",
    "write_csv",
    "write_kafka_dump",
    "write_parquet",
]

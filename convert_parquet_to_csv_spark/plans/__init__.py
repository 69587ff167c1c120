"""Query registry: named queries + their DuckDB oracle SQL."""

from convert_parquet_to_csv_spark.plans.registry import (
    ORACLES,
    QUERIES,
    query,
)

__all__ = ["ORACLES", "QUERIES", "query"]

"""Shared helpers for the gated query modules.

Centralizes the two things every plans/ module needs: loading a
fixture table (with the nanos-timestamp special case for ``events``)
and the DECIMAL(18,4) routing that keeps float aggregates
order-independent across engines (plans/registry.py rules).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.sources import (
    read_parquet,
    read_parquet_nanos_ts,
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. ``events`` carries TIMESTAMP(NANOS)
    parquet columns (TESTDATA) and must go through the nanos reader."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return read_parquet_nanos_ts(spark, path)
    return read_parquet(spark, path)


def dec(col: str | Column) -> Column:
    """Cast to DECIMAL(18,4): exact, order-independent summation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,4)")

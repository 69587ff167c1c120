"""Driver-checked query: windowed event aggregation (batch flavor).

The streaming flavor of the same function is exercised in
tests/test_streaming.py (batch/stream equality); the driver oracle
checks the shared aggregation logic against DuckDB ``date_trunc``
(1-hour tumbling windows align with epoch ⇒ hour truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet_nanos_ts
from convert_parquet_to_csv_spark.streaming import windowed_event_agg

_WINDOW_ORACLE = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("windowed_agg", oracle=_WINDOW_ORACLE)
def windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window × event_type counts and value sums."""
    ev = read_parquet_nanos_ts(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    return windowed_event_agg(ev, window="1 hour")

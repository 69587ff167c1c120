"""Driver-checked Kafka-shaped ingest coverage.

The reference has no message-bus source (SURVEY.md §2.1 scans row: "No
JSON/ORC/Avro/JDBC/Kafka"); sources/kafka_shape.py adds the pattern.
The gated query proves the full envelope roundtrip — rows → Kafka
records (JSON value, keyed partitions, dense offsets) → partitioned
parquet landing zone → readback → parse → aggregate — against an
oracle that aggregates the original table directly. A value-hash match
means serialization lost nothing, not merely that rows came back.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans.common import dec, load_table
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir
from convert_parquet_to_csv_spark.sources import (
    parse_kafka_records,
    read_kafka_dump,
    to_kafka_records,
    write_kafka_dump,
)
from convert_parquet_to_csv_spark.streaming.events import EVENT_SCHEMA

_ROUNDTRIP_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


@query("kafka_roundtrip_events", oracle=_ROUNDTRIP_ORACLE)
def kafka_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Kafka records → bus-dump parquet → parse → aggregate.

    The whole path is column expressions (`to_json`/`from_json`) plus
    one window for dense offsets — JVM-side, no Python row path. The
    landing zone is laid out by (topic, partition) so a single
    partition's replay prunes the rest at scan time.
    """
    events = load_table(spark, sf_dir, "events")
    records = to_kafka_records(
        events, key_col="user_id", topic="events", ts_col="ts"
    )
    dump = scratch_dir(sf_dir, "kafka_dump")
    write_kafka_dump(records, dump)
    back = parse_kafka_records(read_kafka_dump(spark, dump), EVENT_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )

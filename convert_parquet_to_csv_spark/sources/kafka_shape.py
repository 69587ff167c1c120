"""Kafka-shaped source/sink: the message-bus landing-zone pattern.

The reference has no streaming ingest (SURVEY.md §2.1 "No
JSON/ORC/Avro/JDBC/Kafka"), but a 100 TB training-data pipeline almost
always lands records from a bus. This module implements the pattern
Spark's own Kafka connector defines — records with the fixed schema

    key BINARY, value BINARY, topic STRING, partition INT,
    offset LONG, timestamp TIMESTAMP, timestampType INT

(the exact columns ``spark.read.format("kafka")`` produces) — so every
downstream operator written against it runs unchanged whether records
come from a real broker or from bus-dump files in object storage.

Two halves:

- :func:`to_kafka_records` / :func:`parse_kafka_records` — serialize a
  DataFrame into Kafka-record rows (JSON value envelope) and parse them
  back with a pinned schema. Pure column expressions (`to_json` /
  `from_json`), JVM-side, codegen-friendly — no Python row path.
- :func:`read_kafka` — the real-broker reader. The spark-sql-kafka
  connector jars are NOT in this container, so this raises a clear
  error locally; on a cluster with the package on the classpath it
  returns the stream unchanged. Everything testable here goes through
  the file-based shape instead.

At scale: ``partition`` is carried through so bus partitioning can be
reused as Spark partitioning (`repartition("partition")` gives
per-partition ordered replay without a second shuffle); offsets are
per-partition dense ranks, the bus's own ordering contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# to_json's default timestamp rendering is millisecond-precision;
# Spark timestamps are microsecond. Pin the envelope format on BOTH
# serialize and parse so the roundtrip is lossless.
_JSON_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}

KAFKA_RECORD_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]


def to_kafka_records(
    df: DataFrame,
    key_col: str,
    topic: str,
    ts_col: str | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Serialize rows into Kafka-record shape with a JSON value envelope.

    ``value`` is ``to_json(struct(*))`` of the full row — the dominant
    real-world bus encoding. ``partition`` is a stable hash of the key
    (Kafka's own default partitioner semantics: same key → same
    partition), and ``offset`` is a deterministic dense per-partition
    sequence so replay tests are exact. ``timestampType`` is 0
    (CreateTime), matching the connector's constant for
    producer-stamped records.
    """
    ts = (
        F.col(ts_col).cast("timestamp")
        if ts_col is not None
        else F.lit("1970-01-01 00:00:00").cast("timestamp")
    )
    key = F.col(key_col).cast("string").cast("binary")
    part = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(num_partitions)).cast(
        "int"
    )
    rec = df.select(
        key.alias("key"),
        F.to_json(F.struct(*df.columns), _JSON_TS_OPTS).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        ts.alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    # Deterministic per-partition offset: order by (timestamp, value) —
    # value as tiebreak keeps it total. One shuffle (the window), same
    # key distribution a real producer would create.
    w = Window.partitionBy("topic", "partition").orderBy(
        "timestamp", F.col("value").cast("string")
    )
    return rec.withColumn("offset", F.row_number().over(w).cast("long") - 1).select(
        *KAFKA_RECORD_COLUMNS
    )


def parse_kafka_records(
    records: DataFrame,
    value_schema: str,
    keep_metadata: bool = False,
) -> DataFrame:
    """Parse the JSON ``value`` envelope back into typed columns.

    ``value_schema`` is a DDL string (streams must not infer —
    streaming/events.py pins EVENT_SCHEMA the same way). Corrupt
    payloads yield NULL structs rather than failing the job
    (`from_json` PERMISSIVE default) — at 100 TB a poison message must
    not kill the pipeline; filter `parsed IS NULL` into a dead-letter
    sink if needed.
    """
    parsed = records.withColumn(
        "_parsed",
        F.from_json(F.col("value").cast("string"), value_schema, _JSON_TS_OPTS),
    )
    data = [F.col(f"_parsed.{f}").alias(f) for f in parsed.select("_parsed.*").columns]
    meta: list[Column] = (
        [F.col(c) for c in ("topic", "partition", "offset", "timestamp")]
        if keep_metadata
        else []
    )
    return parsed.select(*data, *meta)


def write_kafka_dump(records: DataFrame, path: str) -> None:
    """Persist Kafka-shaped records as a parquet landing zone, laid out
    by bus partition (`partitionBy`) so replay of one partition prunes
    all others at scan time."""
    records.write.mode("overwrite").partitionBy("topic", "partition").parquet(path)


def read_kafka_dump(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet landing zone back as Kafka-shaped records."""
    df = spark.read.parquet(path)
    # partitionBy wrote topic/partition as directory keys; restore the
    # connector's exact types and column order.
    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.col("topic").cast("string").alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("timestamp").cast("timestamp").alias("timestamp"),
        F.col("timestampType").cast("int").alias("timestampType"),
    )


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = True,
) -> DataFrame:
    """Real-broker reader via the spark-sql-kafka connector.

    Returns the standard Kafka record DataFrame (same shape as
    :func:`read_kafka_dump` — downstream code is identical). The
    connector jar (`spark-sql-kafka-0-10`) is not bundled with this
    container's Spark; absence raises a clear, actionable error rather
    than a deep Java stack.
    """
    reader = spark.readStream if streaming else spark.read
    try:
        return (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # connector jar absent → AnalysisException
        raise NotImplementedError(
            "Kafka connector (spark-sql-kafka-0-10) is not on the "
            "classpath in this environment; submit with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "on a real cluster, or use read_kafka_dump() on a bus dump."
        ) from exc

"""Kafka-shaped source tests: envelope roundtrip, partition/offset
contract, corrupt-payload policy, and the real-connector gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.sources import (
    parse_kafka_records,
    read_kafka,
    read_kafka_dump,
    read_parquet_nanos_ts,
    to_kafka_records,
    write_kafka_dump,
)
from convert_parquet_to_csv_spark.sources.kafka_shape import (
    KAFKA_RECORD_COLUMNS,
)
from convert_parquet_to_csv_spark.streaming.events import EVENT_SCHEMA


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return read_parquet_nanos_ts(
        spark, os.path.join(sf_small, "events.parquet")
    ).cache()


@pytest.fixture(scope="module")
def records(events):
    return to_kafka_records(
        events, key_col="user_id", topic="events", ts_col="ts"
    ).cache()


def test_record_schema_matches_connector(records):
    assert records.columns == KAFKA_RECORD_COLUMNS
    types = dict(records.dtypes)
    assert types["key"] == "binary"
    assert types["value"] == "binary"
    assert types["partition"] == "int"
    assert types["offset"] == "bigint"
    assert types["timestamp"] == "timestamp"


def test_roundtrip_preserves_rows_and_values(spark, events, records):
    back = parse_kafka_records(records, EVENT_SCHEMA)
    assert back.columns == events.columns
    assert dict(back.dtypes) == dict(events.dtypes)
    assert back.count() == events.count()
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0


def test_same_key_same_partition(records):
    # Kafka's contract: one key never spans partitions.
    multi = (
        records.groupBy("key")
        .agg(F.countDistinct("partition").alias("nparts"))
        .filter(F.col("nparts") > 1)
    )
    assert multi.count() == 0


def test_offsets_dense_per_partition(records):
    per_part = records.groupBy("partition").agg(
        F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
        F.count("*").alias("n"),
        F.countDistinct("offset").alias("n_distinct"),
    )
    for r in per_part.collect():
        assert r.lo == 0
        assert r.hi == r.n - 1
        assert r.n_distinct == r.n


def test_dump_roundtrip_and_partition_pruning(spark, records, tmp_path):
    dump = str(tmp_path / "dump")
    write_kafka_dump(records, dump)
    back = read_kafka_dump(spark, dump)
    assert back.columns == KAFKA_RECORD_COLUMNS
    assert back.count() == records.count()
    one = back.filter(F.col("partition") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partitionBy layout → the partition filter prunes directories,
    # not rows: it must appear as a PartitionFilter in the scan.
    assert "PartitionFilters" in plan
    assert one.count() == records.filter(F.col("partition") == 0).count()


def test_corrupt_value_yields_nulls_not_failure(spark):
    bad = spark.createDataFrame(
        [(bytearray(b"k"), bytearray(b"{not json"), "t", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    out = parse_kafka_records(bad, EVENT_SCHEMA).collect()
    assert len(out) == 1
    assert out[0].event_id is None


def test_real_kafka_reader_gated(spark):
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_kafka(spark, "localhost:9092", "t")

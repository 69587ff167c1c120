"""Tests for the custom Python data source (sources/pysource.py)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.sources.pysource import (
    register_once,
    SynthDocsDataSource,
    _IdSlice,
    _SynthDocsReader,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_once(spark, SynthDocsDataSource)
    return spark


def test_reads_deterministic_rows(registered):
    df = (
        registered.read.format("synthdocs")
        .option("n_rows", 100)
        .option("n_parts", 7)
        .load()
    )
    rows = {r.id: (r.fingerprint, r.n_tokens) for r in df.collect()}
    assert len(rows) == 100
    h = hashlib.md5(b"42").hexdigest()
    assert rows[42] == (h, 10 + int(h[:8], 16) % 100)


def test_filter_pushdown_prunes_partitions():
    """id-range predicates must narrow the range BEFORE partition
    planning — the Python-source equivalent of row-group pruning."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    r = _SynthDocsReader({"n_rows": "1000", "n_parts": "10"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 900),
                LessThan(("id",), 950),
                IsNotNull(("fingerprint",)),
            ]
        )
    )
    # the two range filters are consumed; IsNotNull comes back
    assert len(leftover) == 1
    parts = r.partitions()
    assert all(isinstance(p, _IdSlice) for p in parts)
    assert min(p.start for p in parts) == 900
    assert max(p.end for p in parts) == 950
    # 50 ids over 10 requested parts → ≤10 small slices, never 1000-row
    assert sum(p.end - p.start for p in parts) == 50


def test_filtered_scan_end_to_end(registered):
    df = (
        registered.read.format("synthdocs")
        .option("n_rows", 1000)
        .option("n_parts", 10)
        .load()
        .filter((F.col("id") >= 990) & (F.col("id") < 995))
    )
    assert sorted(r.id for r in df.collect()) == [990, 991, 992, 993, 994]


def test_empty_range_yields_zero_rows(registered):
    df = (
        registered.read.format("synthdocs")
        .option("n_rows", 10)
        .load()
        .filter(F.col("id") > 100)
    )
    assert df.count() == 0


def test_jsonl_sink_writes_and_reads_back(spark, tmp_path):
    """Writer half: two-phase commit must land exactly the written
    rows plus a _SUCCESS marker, with no staging leftovers."""
    import os

    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        JsonlSinkDataSource,
    )

    register_once(spark, JsonlSinkDataSource)
    dst = str(tmp_path / "sink")
    os.makedirs(dst)
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("tag")
    ).repartition(5)
    df.write.format("jsonlsink").mode("overwrite").option("path", dst).save()
    assert os.path.exists(os.path.join(dst, "_SUCCESS"))
    assert not os.path.exists(os.path.join(dst, "_staging"))
    with open(os.path.join(dst, "_SUCCESS")) as fh:
        assert fh.read().strip() == "100"
    back = spark.read.schema("id BIGINT, tag STRING").json(dst)
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_jsonl_sink_overwrite_replaces_append_accumulates(spark, tmp_path):
    import os

    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        JsonlSinkDataSource,
    )

    register_once(spark, JsonlSinkDataSource)
    dst = str(tmp_path / "sink2")
    os.makedirs(dst)
    df = spark.range(10).repartition(2)
    w = lambda mode: df.write.format("jsonlsink").mode(mode).option(  # noqa: E731
        "path", dst
    ).save()
    w("overwrite")
    w("overwrite")  # stale part files must be replaced, not doubled
    back = spark.read.schema("id BIGINT").json(dst)
    assert back.count() == 10
    w("append")
    assert spark.read.schema("id BIGINT").json(dst).count() == 20


def test_jsonl_sink_requires_path(spark):
    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        JsonlSinkDataSource,
    )

    register_once(spark, JsonlSinkDataSource)
    import pytest as _pytest

    with _pytest.raises(Exception, match="path"):
        spark.range(1).write.format("jsonlsink").mode(
            "overwrite"
        ).save()


def test_streaming_source_drains_deterministically(spark, tmp_path):
    """The streaming flavor: offset-tracked micro-batches through a
    checkpoint, exactly-once across a restart (same contract as the
    file source, but via the Python SimpleDataSourceStreamReader)."""
    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        SynthDocsStreamDataSource,
    )

    register_once(spark, SynthDocsStreamDataSource)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def drain_one_batch():
        # PythonMicroBatchStream doesn't implement availableNow; Spark
        # falls back to exactly ONE micro-batch per start — which
        # makes each start() a clean offset-advance + restart test.
        q = (
            spark.readStream.format("synthdocs_stream")
            .option("n_rows", 250)
            .option("rows_per_batch", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120_000)

    for want in (100, 200, 250):
        drain_one_batch()
        assert spark.read.parquet(sink).count() == want
    got = spark.read.parquet(sink)
    assert got.select("id").distinct().count() == 250
    # source exhausted: a further restart emits nothing new
    drain_one_batch()
    assert spark.read.parquet(sink).count() == 250

"""Structured Streaming tests: file-source stream, windows, watermark,
sessionization, custom state — and batch/stream result equality."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.sources import read_parquet_nanos_ts
from convert_parquet_to_csv_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    running_user_counts,
    sessionized_events,
    windowed_event_agg,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_small, tmp_path_factory):
    """Events re-written as a 3-file parquet directory (micro-batches)."""
    out = str(tmp_path_factory.mktemp("events_stream_src"))
    ev = read_parquet_nanos_ts(
        spark, os.path.join(sf_small, "events.parquet")
    )
    ev.repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_stream_windowed_agg_equals_batch(spark, events_dir):
    """The same windowed_event_agg over stream vs batch must agree —
    the core guarantee that lets the DuckDB oracle check the batch
    flavor and carry over to the stream."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    run_stream_to_memory(
        windowed_event_agg(stream), "win_agg_stream", output_mode="complete"
    )
    got = spark.table("win_agg_stream")

    batch = windowed_event_agg(spark.read.parquet(events_dir))
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_watermark_present_in_plan(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_agg(stream, watermark="45 minutes")
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()


def test_sessionization(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    sess = sessionized_events(batch, gap="30 minutes")
    rows = sess.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1
    # sessions per user don't overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1


def test_running_user_counts_stateful(spark, events_dir):
    """Custom stateful operator accumulates across micro-batches."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    run_stream_to_memory(
        running_user_counts(stream), "user_counts_stream", output_mode="update"
    )
    got = spark.table("user_counts_stream")
    # final (max) running count per user == total events per user
    final = got.groupBy("user_id").agg(F.max("events_so_far").alias("n"))
    expected = (
        spark.read.parquet(events_dir).groupBy("user_id").count()
    )
    diff = final.join(expected, "user_id").filter(
        F.col("n") != F.col("count")
    )
    assert diff.count() == 0
    # with 3 micro-batches, at least one user must have emitted
    # multiple intermediate totals (proof state crossed batches)
    multi = got.groupBy("user_id").count().filter(F.col("count") > 1)
    assert multi.count() > 0


def test_stream_static_join_enrichment(spark, events_dir, sf_small):
    """Stream-static join: events enriched with a static dim table;
    stream result must equal the batch join."""
    from convert_parquet_to_csv_spark.streaming import (
        enrich_with_dim,
        read_events_stream,
        run_stream_to_memory,
    )

    dim = (
        spark.read.parquet(os.path.join(sf_small, "customer.parquet"))
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    enriched = enrich_with_dim(
        stream.select("event_id", "user_id"), dim, on="user_id"
    )
    run_stream_to_memory(enriched, "enriched_stream", output_mode="append")
    got = spark.table("enriched_stream")

    batch = enrich_with_dim(
        spark.read.parquet(events_dir).select("event_id", "user_id"),
        dim,
        on="user_id",
    )
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_stream_dedup_drops_redelivery(spark, events_dir, tmp_path):
    """Streaming dedup: a duplicated file (redelivery) must not double
    the distinct-key count."""
    import shutil

    from convert_parquet_to_csv_spark.streaming import (
        dedup_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    dup_dir = str(tmp_path / "dup_src")
    shutil.copytree(events_dir, dup_dir)
    # redeliver every file once under a new name
    for f in os.listdir(events_dir):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(events_dir, f),
                os.path.join(dup_dir, "redelivered_" + f),
            )
    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=2)
    deduped = dedup_stream(stream, keys=["event_id"])
    run_stream_to_memory(
        deduped.select("event_id"), "dedup_stream_t", output_mode="append"
    )
    got = spark.table("dedup_stream_t")
    n_unique = spark.read.parquet(events_dir).count()
    assert got.count() == n_unique
    assert got.distinct().count() == n_unique


def test_stream_dedup_within_watermark_catches_ts_drift(spark, tmp_path):
    """dropDuplicatesWithinWatermark must drop a re-delivered key even
    when the replica's event-time drifted — the case dedup_stream's
    key+ts match deliberately passes through."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.streaming import (
        dedup_stream_within_watermark,
        read_events_stream,
        run_stream_to_memory,
    )

    src = str(tmp_path / "drift_src")
    os.makedirs(src)
    base = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100, "click", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 101, "view", 2.0, "{}"),
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    drifted = base.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 3 SECONDS")
    )
    import glob
    import shutil

    for i, df in enumerate((base, drifted)):
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    run_stream_to_memory(
        dedup_stream_within_watermark(stream, keys=["event_id"]).select(
            "event_id", "user_id"
        ),
        "dedup_wm_t",
        output_mode="append",
    )
    got = spark.table("dedup_wm_t")
    assert got.count() == 2
    assert sorted(r.event_id for r in got.collect()) == [1, 2]


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Watermarked stream-stream interval join must produce the same
    pairs as the equivalent batch join."""
    from convert_parquet_to_csv_spark.streaming import (
        join_click_view_streams,
        read_events_stream,
        run_stream_to_memory,
    )

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "view"),
        )

    # One micro-batch (no maxFilesPerTrigger): the fixture's files are
    # NOT time-ordered, and with multiple batches the watermark after
    # batch 0 (global max - 1h) correctly drops older rows arriving in
    # later files as late data — verified separately below. Real
    # landing zones deliver roughly time-ordered files.
    sc, sv = split(read_events_stream(spark, events_dir))
    joined = join_click_view_streams(sc, sv, window_minutes=5)
    run_stream_to_memory(joined, "ss_join_t", output_mode="append")
    got = spark.table("ss_join_t")

    bc, bv = split(spark.read.parquet(events_dir))
    want = join_click_view_streams(bc, bv, window_minutes=5)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_stream_join_drops_late_rows_past_watermark(spark, tmp_path):
    """With out-of-time-order file arrival and per-file batches, rows
    older than the advanced watermark are dropped — the state-eviction
    contract that keeps stream-stream join state bounded.

    The file source orders micro-batches by file mtime, so each file's
    mtime is staggered explicitly: batch 0 carries recent (non-matching)
    rows that advance both watermarks, and the only matching click/view
    pair arrives afterwards in separate files, far behind the watermark.
    """
    import datetime as dt

    from convert_parquet_to_csv_spark.streaming import (
        join_click_view_streams,
        read_events_stream,
        run_stream_to_memory,
    )

    utc = dt.timezone.utc
    recent = dt.datetime(2024, 2, 1, 12, 0, tzinfo=utc)
    old = dt.datetime(2024, 1, 27, 10, 0, tzinfo=utc)
    files = [
        # batch 0: recent click + view for DIFFERENT users (no match),
        # advancing both sides' watermarks to ~recent - 1h.
        [
            (1, recent, 10, "click", 1.0, "{}"),
            (2, recent, 20, "view", 1.0, "{}"),
        ],
        # batches 1 and 2: the only matching pair, now late.
        [(3, old + dt.timedelta(minutes=2), 1, "click", 1.0, "{}")],
        [(4, old, 1, "view", 1.0, "{}")],
    ]
    src = tmp_path / "late_src"
    src.mkdir()
    from convert_parquet_to_csv_spark.streaming.events import EVENT_SCHEMA

    for i, rows in enumerate(files):
        part = tmp_path / f"part_{i}"
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        (data_file,) = [p for p in part.glob("part-*.parquet")]
        target = src / f"file_{i}.parquet"
        data_file.rename(target)
        os.utime(target, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    s = read_events_stream(spark, str(src), max_files_per_trigger=1)
    joined = join_click_view_streams(
        s.filter(F.col("event_type") == "click"),
        s.filter(F.col("event_type") == "view"),
        window_minutes=5,
        watermark="1 hour",
    )
    # Guard against a vacuous pass: in batch mode (no late-arrival
    # semantics) the old pair DOES match.
    batch = spark.read.schema(EVENT_SCHEMA).parquet(str(src))
    assert (
        join_click_view_streams(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "view"),
            window_minutes=5,
        ).count()
        == 1
    )

    run_stream_to_memory(joined, "ss_join_late_t", output_mode="append")
    assert spark.table("ss_join_late_t").count() == 0


def test_stream_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """Checkpointed file-source stream restarts process ONLY files that
    arrived since the last run — the exactly-once ingestion contract a
    landing-zone pipeline relies on (no re-reads, no duplicates)."""
    src = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def land(lo, hi, name):
        spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 5).alias("user_id"),
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema("event_id LONG, user_id LONG")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120_000)

    land(0, 100, "a")
    drain()
    first = spark.read.parquet(sink)
    assert first.count() == 100

    land(100, 130, "b")
    drain()
    final = spark.read.parquet(sink)
    # exactly once: every id present, none twice
    assert final.count() == 130
    assert final.select("event_id").distinct().count() == 130


def test_transform_with_state_running_counts(spark, events_dir):
    """transformWithStateInPandas (the Spark 4 stateful API) must
    produce the same final per-user totals as the batch count — and as
    the legacy applyInPandasWithState flavor it re-expresses.

    Skips where protobuf is absent (this container): the TWS Python
    runner speaks protobuf to the JVM state server."""
    import pytest

    pytest.importorskip("google.protobuf")
    from convert_parquet_to_csv_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        running_user_counts_tws,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = read_events_stream(
            spark, events_dir, max_files_per_trigger=1
        )
        run_stream_to_memory(
            running_user_counts_tws(stream),
            "tws_counts_t",
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    final = (
        spark.table("tws_counts_t")
        .groupBy("user_id")
        .agg(F.max("events_so_far").alias("n"))
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    got = {r.user_id: r.n for r in final.collect()}
    want = {r.user_id: r.n for r in batch.collect()}
    assert got == want and len(got) > 0

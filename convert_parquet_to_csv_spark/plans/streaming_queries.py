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
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir
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


# --- live Structured Streaming, driver-gated ------------------------------
#
# These three run the REAL streaming machinery to completion inside the
# gate: stage the events fixture as a parquet landing zone, drain it with
# an availableNow file-source stream into a memory sink, and return the
# drained table. Results are deterministic (the stream sees exactly the
# fixture rows), so each gets a plain batch SQL oracle — streaming
# execution, batch-checkable answers.

import shutil

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    running_user_counts,
    sessionized_events,
)


def _staged_events(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Stage the nanos-timestamp fixture as a 3-file landing zone whose
    arrival order matches event time.

    ``repartitionByRange(3, ts)`` puts disjoint ascending time spans in
    part-00000/1/2; each file's mtime is then staggered in that order
    (the file source schedules micro-batches oldest-mtime-first). With
    arrival order = event-time order the watermark only ever trails the
    batch being processed, so nothing is dropped as late and the drain
    is deterministic — the same invariant a production landing zone
    gets from approximately-ordered ingestion."""
    import glob

    out = scratch_dir(sf_dir, f"stream_{name}")
    parts = out + "_parts"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(parts, ignore_errors=True)
    ev = read_parquet_nanos_ts(spark, os.path.join(sf_dir, "events.parquet"))
    ev.repartitionByRange(3, "ts").write.mode("overwrite").parquet(parts)
    os.makedirs(out)
    for i, src in enumerate(sorted(glob.glob(os.path.join(parts, "part-*.parquet")))):
        dst = os.path.join(out, f"file_{i}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    shutil.rmtree(parts, ignore_errors=True)
    return out


@query("streaming_windowed_agg_live", oracle=_WINDOW_ORACLE)
def streaming_windowed_agg_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowed_agg's STREAMING flavor, drained via availableNow into a
    memory sink — same oracle as the batch flavor, proving
    batch/stream equivalence through the driver gate itself."""
    src = _staged_events(spark, sf_dir, "winagg")
    from convert_parquet_to_csv_spark.streaming import windowed_event_agg

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    run_stream_to_memory(
        windowed_event_agg(stream), "cptc_gate_winagg", output_mode="complete"
    )
    return spark.table("cptc_gate_winagg")


_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), isl AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM isl GROUP BY user_id, sid
"""


@query("streaming_session_windows_live", oracle=_SESSION_ORACLE)
def streaming_session_windows_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (``session_window``, 30-min gap) run
    as a real stream to completion. The oracle rebuilds sessions in
    SQL via the lag→flag→running-sum island trick: identical
    (start, end=last+gap, user, count) tuples."""
    src = _staged_events(spark, sf_dir, "sessions")
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    run_stream_to_memory(
        sessionized_events(stream, gap="30 minutes"),
        "cptc_gate_sessions",
        output_mode="complete",
    )
    return spark.table("cptc_gate_sessions")


_RUNNING_ORACLE = """
SELECT user_id, COUNT(*) AS events_so_far
FROM events GROUP BY user_id
"""


@query("streaming_running_counts_live", oracle=_RUNNING_ORACLE)
def streaming_running_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) through the
    gate: per-user cumulative counts, drained with availableNow. The
    memory sink keeps one update row per (user, micro-batch); the max
    per user is the final state — which must equal the plain batch
    COUNT(*), the oracle."""
    src = _staged_events(spark, sf_dir, "running")
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    run_stream_to_memory(
        running_user_counts(stream), "cptc_gate_running", output_mode="update"
    )
    return (
        spark.table("cptc_gate_running")
        .groupBy("user_id")
        .agg(F.max("events_so_far").alias("events_so_far"))
    )


# --- at-least-once dedup (dropDuplicatesWithinWatermark) ------------------

# The oracle is the ORIGINAL events table: the stream input is every
# event delivered twice (the replica's ts drifted +1 s), so the dedup
# must collapse the doubled stream back to exactly one row per
# event_id. ts is excluded from the output because WHICH replica
# survives (original vs +1 s) depends on in-batch arrival order; every
# other column is identical between replicas, so the result is
# deterministic without it.
_STREAM_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, value, props FROM events
"""


@query("streaming_dedup_live", oracle=_STREAM_DEDUP_ORACLE)
def streaming_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once ingestion made exactly-once (Spark 4
    ``dropDuplicatesWithinWatermark`` via streaming/events.
    dedup_stream_within_watermark): the landing zone re-delivers every
    event with a drifted timestamp — the Kafka-replay case where a
    key+ts dedup would pass the replica through — and the drained
    output must equal the original table exactly. Per-key state is
    bounded by the 2 h watermark horizon, not the corpus size; a
    replica split across micro-batches is still caught because the
    1 s drift is far inside the horizon."""
    import glob

    from convert_parquet_to_csv_spark.streaming import (
        dedup_stream_within_watermark,
    )

    ev = read_parquet_nanos_ts(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    redelivered = ev.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")
    )
    out = scratch_dir(sf_dir, "stream_dedup")
    parts = out + "_parts"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(parts, ignore_errors=True)
    ev.unionByName(redelivered).repartitionByRange(
        3, "ts"
    ).write.mode("overwrite").parquet(parts)
    os.makedirs(out)
    for i, src_f in enumerate(
        sorted(glob.glob(os.path.join(parts, "part-*.parquet")))
    ):
        dst = os.path.join(out, f"file_{i}.parquet")
        shutil.move(src_f, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    shutil.rmtree(parts, ignore_errors=True)

    stream = read_events_stream(spark, out, max_files_per_trigger=1)
    run_stream_to_memory(
        dedup_stream_within_watermark(stream, keys=["event_id"]).select(
            "event_id", "user_id", "event_type", "value", "props"
        ),
        "cptc_gate_dedup",
        output_mode="append",
    )
    return spark.table("cptc_gate_dedup")


# --- foreachBatch → MERGE: the streaming-upsert integration ---------------

_STREAM_UPSERT_ORACLE = """
WITH r AS (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS _rn
  FROM events
)
SELECT user_id, event_type, ts AS last_ts,
       CAST(value AS DOUBLE) AS last_value
FROM r WHERE _rn = 1
"""


@query("streaming_foreachbatch_upsert_live", oracle=_STREAM_UPSERT_ORACLE)
def streaming_foreachbatch_upsert_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streaming-materialized-view pattern: every micro-batch is
    reduced to one row per (user_id, event_type) — the batch's max-ts
    observation — and MERGEd into a parquet state table via
    ``foreachBatch`` + operators/upsert.py (update-wins).

    Deterministic and SQL-replayable because the landing zone is
    event-time-ordered (``_staged_events``): the last batch touching a
    key carries that key's globally-latest row, so the final table is
    exactly "latest row per key", which the oracle computes with one
    window over the raw events."""
    from pyspark.sql.window import Window

    from convert_parquet_to_csv_spark.operators.upsert import (
        upsert_parquet,
    )

    src = _staged_events(spark, sf_dir, "febupsert")
    state = scratch_dir(sf_dir, "stream_state")
    ckpt = scratch_dir(sf_dir, "stream_state_ckpt")
    shutil.rmtree(state, ignore_errors=True)
    # A stale checkpoint from an interrupted prior run would mark the
    # staged files as already processed → zero batches → empty result.
    shutil.rmtree(ckpt, ignore_errors=True)

    # Seed an empty state table with the output schema.
    empty = (
        spark.read.parquet(src)
        .select("user_id", "event_type", "ts", "value", "event_id")
        .limit(0)
    )
    empty.write.mode("overwrite").parquet(state)

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            batch.select("user_id", "event_type", "ts", "value", "event_id")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        upsert_parquet(
            batch.sparkSession,
            state,
            latest,
            key_cols=["user_id", "event_type"],
        )

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    return spark.read.parquet(state).select(
        "user_id",
        "event_type",
        F.col("ts").alias("last_ts"),
        F.col("value").cast("double").alias("last_value"),
    )


# --- stream-stream interval join ------------------------------------------

_SS_JOIN_ORACLE = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT event_id AS view_id, user_id AS view_user_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
)
SELECT c.click_id, c.user_id, c.click_ts, v.view_id, v.view_ts
FROM c JOIN v ON c.user_id = v.view_user_id
 AND v.view_ts <= c.click_ts
 AND v.view_ts >= c.click_ts - INTERVAL 5 MINUTE
"""


@query("streaming_stream_join_live", oracle=_SS_JOIN_ORACLE)
def streaming_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-STREAM interval join run as a real stream:
    clicks matched to same-user views in the preceding 5 minutes
    (streaming/events.join_click_view_streams), drained availableNow
    into a memory sink in append mode. Both sides carry watermarks and
    the join bounds event time on both sides — the pair of constraints
    that lets Spark evict join state instead of holding both streams
    forever. Single-batch drain (no maxFilesPerTrigger) so every match
    is emitted before the stream stops; the oracle is the equivalent
    batch range join."""
    from convert_parquet_to_csv_spark.streaming import (
        join_click_view_streams,
    )

    src = _staged_events(spark, sf_dir, "ssjoin")
    ev = read_events_stream(spark, src)
    joined = join_click_view_streams(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        window_minutes=5,
    )
    run_stream_to_memory(joined, "cptc_gate_ssjoin", output_mode="append")
    return spark.table("cptc_gate_ssjoin")


# --- hopping (sliding) windows --------------------------------------------

# 1h window hopping every 30min ⇒ each event belongs to exactly two
# windows: starts floor30(ts) and floor30(ts) − 30min. The oracle
# materializes that membership with unnest — exact, no approximation.
_HOPPING_ORACLE = """
WITH m AS (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)),
                 time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
                   - INTERVAL 30 MINUTE]) AS window_start,
         event_type, value
  FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM m GROUP BY window_start, event_type
"""


@query("hopping_window_agg", oracle=_HOPPING_ORACLE)
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (``F.window`` with a
    slide) — the overlapping-window flavor: each event lands in two
    windows, Spark expands the membership JVM-side before one
    (window, type) partial→final aggregation. Same plan streaming
    (windowed_event_agg) or batch, as with the tumbling flavor."""
    ev = read_parquet_nanos_ts(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_STATIC_ENRICH_ORACLE = """
SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@query("streaming_static_enrich_live", oracle=_STATIC_ENRICH_ORACLE)
def streaming_static_enrich_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream–static enrichment drained live: each micro-batch
    left-joins the (broadcast) customer dimension — the standard
    attribute-enrichment shape, stateless because the static side is
    re-planned per batch — then feeds a running per-segment
    aggregate. Unmatched users keep flowing as 'UNKNOWN' (a LEFT
    join; an inner join would silently drop them). The oracle is the
    equivalent batch join+agg: stream execution, batch-checkable
    answer, like every *_live gate."""
    from convert_parquet_to_csv_spark.sources import read_parquet
    from convert_parquet_to_csv_spark.streaming import enrich_with_dim

    src = _staged_events(spark, sf_dir, "enrich")
    dim = read_parquet(
        spark, os.path.join(sf_dir, "customer.parquet")
    ).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    enriched = enrich_with_dim(stream, dim, "user_id")
    agg = (
        enriched.withColumn(
            "segment", F.coalesce("segment", F.lit("UNKNOWN"))
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    run_stream_to_memory(
        agg, "cptc_gate_enrich", output_mode="complete"
    )
    return spark.table("cptc_gate_enrich")

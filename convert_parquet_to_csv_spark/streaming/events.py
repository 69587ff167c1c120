"""Streaming operators: windowed aggregation, sessionization, custom state.

The reference has no streaming at all (SURVEY.md §2.1: its "streaming"
is polars' pipelined batch mode). This module adds the Structured
Streaming surface a training-data pipeline needs:

- file-source stream (``readStream``) over event parquet/json drops —
  the standard landing-zone ingestion shape;
- tumbling-window aggregation with a watermark for late data;
- session windows (gap-based) per user;
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-user event counts) — the escape hatch for semantics windows
  can't express.

Every transformation is written against the *unbounded* DataFrame API,
so the exact same function works on a batch DataFrame — used by the
batch oracle query (plans/streaming_queries.windowed_agg) and the
streaming tests, which assert batch/stream result equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

EVENT_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: new files under ``path`` become micro-batches.

    Schema is pinned (streams must not infer), matching the events
    table. ``maxFilesPerTrigger`` bounds per-batch work — the knob that
    keeps backfill catch-up from producing one giant batch.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event type.

    On a streaming input the watermark bounds state: windows older
    than (max event time − watermark) are finalized and dropped —
    late rows beyond it are discarded, the documented trade. On a
    batch input the same code is a plain groupBy (watermark is a
    no-op) — that equivalence is the batch-oracle story.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("_w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (``session_window``): a
    session closes after ``gap`` of user inactivity."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("_s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("_s.start").alias("session_start"),
            F.col("_s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


# --- custom stateful operator --------------------------------------------

_STATE_SCHEMA = StructType([StructField("total", LongType())])
_OUT_SCHEMA = "user_id LONG, events_so_far LONG"


def _update_user_count(key, pdf_iter, state):
    """Running per-user event count (applyInPandasWithState body).

    State = one LONG per user; each micro-batch adds its row count and
    emits the cumulative total. Timeout-free (state lives forever) —
    a TTL would use GroupStateTimeout.ProcessingTimeTimeout.
    """
    import pandas as pd

    total = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "events_so_far": [total]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful op: cumulative events per user across batches.

    ``applyInPandasWithState`` — the documented Python path for state
    machines the built-in windows can't express (SURVEY target list).
    Streaming-only (state requires a stream).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from convert_parquet_to_csv_spark.shipping import ensure_package_shipped

    # _update_user_count is pickled by reference to this module —
    # workers need the package on sys.path regardless of driver cwd.
    ensure_package_shipped(events.sparkSession)

    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_count,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the static
    dimension — the standard enrichment shape (events × user/customer
    attributes). The static side is planned per micro-batch, so a
    small dim broadcasts; no state is kept. Works identically on a
    batch DataFrame (tested both ways)."""
    return events.join(F.broadcast(dim), on, "left")


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key.

    ``dropDuplicates`` on a stream keeps per-key state; the watermark
    bounds that state (keys older than the watermark are evicted) —
    without it, state grows forever. The batch dual is plain
    ``dropDuplicates`` (operators/dedup.py exact family).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        keys + [ts_col]
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming dedup for at-least-once sources (Spark 4
    ``dropDuplicatesWithinWatermark``): a re-delivered event is
    dropped even when its event-time differs from the original's —
    the real Kafka-replay/file-re-drop case, where
    :func:`dedup_stream`'s key+ts match would let the replica
    through. Per-key state lives only within the watermark horizon,
    so memory is bounded by the lateness budget, not the corpus:
    the property that makes at-least-once ingestion safe for a
    training-data landing zone at any scale."""
    return events.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def join_click_view_streams(
    clicks: DataFrame,
    views: DataFrame,
    window_minutes: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream join: each click joined to same-user views in the
    preceding ``window_minutes`` — the streaming dual of
    operators/rangejoin.interval_join.

    Both sides carry watermarks and the join condition bounds event
    time on both sides; that pair of constraints is what lets Spark
    *evict* join state (unbounded state is the stream-stream join
    failure mode). Append-mode output: a match emits once both
    watermarks pass it.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    cond = (
        (c.user_id == v.view_user_id)
        & (v.view_ts <= c.click_ts)
        & (v.view_ts >= c.click_ts - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return c.join(v, cond).select(
        "click_id", "user_id", "click_ts", "view_id", "view_ts"
    )


def running_user_counts_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` flavor of
    :func:`running_user_counts` — the Spark 4 stateful API: typed
    state handles (``getValueState``) instead of one opaque tuple,
    per-key timers, composable state variables.

    Requires the RocksDB state store (the caller sets
    ``spark.sql.streaming.stateStore.providerClass`` before starting
    the query — transformWithState does not run on the default HDFS
    store). Same output contract as the legacy flavor: one
    (user_id, events_so_far) update row per (user, micro-batch).

    The processor class is defined LOCALLY on purpose: the
    transformWithState runner is a separate Python process that
    unpickles the processor before any ``addPyFile`` path exists, so a
    module-level class (pickled by reference) raises
    ModuleNotFoundError there. A local class makes cloudpickle
    serialize it by value — fully self-contained.

    ENVIRONMENT SEAM: that same runner speaks protobuf to the JVM
    state server; without the ``protobuf`` package the query crashes
    at init, so this guard raises immediately with the real reason
    (this container ships no protobuf — the operator is exercised by
    a skip-gated test, the legacy ``applyInPandasWithState`` flavor
    carries the driver-gated coverage).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(its Python runner speaks protobuf to the JVM state "
            "server); install protobuf or use running_user_counts "
            "(applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    class _RunningCountProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._count = handle.getValueState("count", "total LONG")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            total = (
                self._count.get()[0] if self._count.exists() else 0
            )
            for pdf in rows:
                total += len(pdf)
            self._count.update((total,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "events_so_far": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningCountProcessor(),
        outputStructType="user_id LONG, events_so_far LONG",
        outputMode="Update",
        timeMode="None",
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain a stream with availableNow into an in-memory table and
    stop — the deterministic run-to-completion harness used by tests
    (``spark.table(query_name)`` afterwards)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

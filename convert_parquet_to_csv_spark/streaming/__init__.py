"""Structured Streaming operators over the events stream."""

from convert_parquet_to_csv_spark.streaming.events import (
    dedup_stream,
    dedup_stream_within_watermark,
    enrich_with_dim,
    join_click_view_streams,
    read_events_stream,
    run_stream_to_memory,
    running_user_counts,
    running_user_counts_tws,
    sessionized_events,
    windowed_event_agg,
)

__all__ = [
    "dedup_stream",
    "dedup_stream_within_watermark",
    "enrich_with_dim",
    "join_click_view_streams",
    "read_events_stream",
    "run_stream_to_memory",
    "running_user_counts",
    "running_user_counts_tws",
    "sessionized_events",
    "windowed_event_agg",
]

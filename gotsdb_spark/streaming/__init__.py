from gotsdb_spark.streaming.ingest import (
    EVENT_SCHEMA,
    dedup_events,
    read_events_stream,
    run_stream_to_memory,
    session_window_values,
    stream_into_collection_log,
    windowed_event_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_events_stream",
    "windowed_event_counts",
    "session_window_values",
    "dedup_events",
    "stream_into_collection_log",
    "run_stream_to_memory",
]

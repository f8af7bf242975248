from .core import (
    events_stream,
    first_seen_stream,
    incremental_event_edges,
    stream_dedup_first_events,
    stream_event_type_windows,
    stream_session_windows,
    streaming_dedup_counts,
    streaming_enriched_windows,
    streaming_event_windows,
    streaming_sliding_windows,
    stream_sliding_value,
)

__all__ = [
    "events_stream",
    "first_seen_stream",
    "incremental_event_edges",
    "stream_dedup_first_events",
    "stream_event_type_windows",
    "stream_session_windows",
    "streaming_dedup_counts",
    "streaming_enriched_windows",
    "streaming_event_windows",
    "streaming_sliding_windows",
    "stream_sliding_value",
]

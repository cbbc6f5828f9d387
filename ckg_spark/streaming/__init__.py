from .sessions import batch_sessions, streaming_sessions
from .incremental import (
    incremental_mentions,
    stream_pages,
    windowed_event_counts,
)

__all__ = [
    "incremental_mentions",
    "stream_pages",
    "windowed_event_counts",
    "batch_sessions",
    "streaming_sessions",
]

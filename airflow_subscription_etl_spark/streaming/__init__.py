from .events import (
    session_windows_stream,
    sessionize_batch,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "session_windows_stream",
    "sessionize_batch",
    "sliding_counts",
    "stream_dedup",
    "tumbling_counts",
]

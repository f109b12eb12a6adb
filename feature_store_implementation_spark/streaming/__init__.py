from .features import (
    read_events_stream,
    tumbling_features,
    sliding_features,
    session_features,
    dedup_events,
    running_user_state,
    stream_to_offline_store,
)

__all__ = [
    "read_events_stream",
    "tumbling_features",
    "sliding_features",
    "session_features",
    "dedup_events",
    "running_user_state",
    "stream_to_offline_store",
]

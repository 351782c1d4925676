from prefixtree_spark.streaming.events import (
    read_events_stream,
    streaming_tumbling_counts,
)
from prefixtree_spark.streaming.sessionize import streaming_sessionize

__all__ = [
    "read_events_stream",
    "streaming_tumbling_counts",
    "streaming_sessionize",
]

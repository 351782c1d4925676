from prefixtree_spark.streaming.events import (
    read_events_stream,
    streaming_tumbling_counts,
)

__all__ = ["read_events_stream", "streaming_tumbling_counts"]

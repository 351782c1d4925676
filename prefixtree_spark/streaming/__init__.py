from prefixtree_spark.streaming.dedup import (
    streaming_drop_duplicates,
    streaming_exact_dedup,
)
from prefixtree_spark.streaming.events import (
    read_events_stream,
    streaming_tumbling_counts,
)
from prefixtree_spark.streaming.fuzzy import streaming_fuzzy_match
from prefixtree_spark.streaming.ingest import (
    ingest_batch,
    ingest_sequential,
    maintain_ingest,
    streaming_ingest_corpus,
)
from prefixtree_spark.streaming.sessionize import streaming_sessionize
from prefixtree_spark.streaming.sink import (
    published_txn_sink,
    stream_append_published,
)
from prefixtree_spark.streaming.topk import latest_topk, streaming_topk

__all__ = [
    "read_events_stream",
    "streaming_tumbling_counts",
    "streaming_fuzzy_match",
    "streaming_sessionize",
    "streaming_topk",
    "latest_topk",
    "streaming_exact_dedup",
    "streaming_drop_duplicates",
    "ingest_batch",
    "ingest_sequential",
    "maintain_ingest",
    "streaming_ingest_corpus",
    "stream_append_published",
    "published_txn_sink",
]

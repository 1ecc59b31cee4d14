from nativeextractor_spark.streaming.mine import mine_stream, write_stream_merge
from nativeextractor_spark.streaming.stateful import running_mention_counts
from nativeextractor_spark.streaming.dedup import dedup_stream_exact, dedup_stream_near

__all__ = [
    "mine_stream",
    "write_stream_merge",
    "running_mention_counts",
    "dedup_stream_exact",
    "dedup_stream_near",
]

from nativeextractor_spark.streaming.mine import mine_stream, write_stream_merge
from nativeextractor_spark.streaming.stateful import running_mention_counts

__all__ = ["mine_stream", "write_stream_merge", "running_mention_counts"]

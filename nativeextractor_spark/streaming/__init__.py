from nativeextractor_spark.streaming.mine import mine_stream, write_stream_merge

__all__ = ["mine_stream", "write_stream_merge"]

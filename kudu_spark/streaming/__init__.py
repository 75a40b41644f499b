from kudu_spark.streaming.sink import apply_changes, replicate, windowed_rollup, write_stream
from kudu_spark.streaming.stateful import running_user_stats, streaming_funnel
from kudu_spark.streaming.source import (
    ChangeFeedDataSource,
    read_changes,
    register,
    stream_changes,
)

__all__ = [
    "ChangeFeedDataSource",
    "apply_changes",
    "read_changes",
    "register",
    "replicate",
    "running_user_stats",
    "streaming_funnel",
    "windowed_rollup",
    "stream_changes",
    "write_stream",
]

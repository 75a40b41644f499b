from kudu_spark.streaming.sink import apply_changes, replicate, write_stream
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
    "stream_changes",
    "write_stream",
]

from lua_mapreduce_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    stream_session_windows,
    stream_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory_sink",
    "stream_session_windows",
    "stream_tumbling_counts",
]

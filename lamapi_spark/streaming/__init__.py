from lamapi_spark.streaming.sessions import (  # noqa: F401
    stream_sessionize, stream_text_stats,
)

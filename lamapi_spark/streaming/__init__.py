from lamapi_spark.streaming.dedup import stream_exact_dedup  # noqa: F401
from lamapi_spark.streaming.sessions import (  # noqa: F401
    stream_sessionize, stream_text_stats,
)

from .ops import (  # noqa: F401
    sessionized,
    stream_static_join,
    streaming_dedup,
    windowed_agg,
)

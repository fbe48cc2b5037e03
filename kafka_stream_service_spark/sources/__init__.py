"""Source / sink registry (SURVEY.md §2.2 "Sources / sinks").

Batch: parquet / json / csv with explicit schemas.
Streaming: kafka (the reference's source, R1-R5), file-stream (deterministic
replay for tests), rate (synthetic load), plus memory/console/noop/kafka
sinks. Kafka options reproduce the reference's consumer semantics:
earliest offsets (StreamsApplication.java:100), read_committed isolation
(:102), no auto-commit (:101 — Structured Streaming checkpoints offsets
itself), fresh group per query (:95 — Spark generates one per query).
"""

from .readers import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_json,
    read_parquet,
    stream_file_source,
    stream_kafka_source,
    stream_rate_source,
)
from .writers import (  # noqa: F401
    write_kafka_sink,
    write_memory_sink,
    write_noop_sink,
)

"""Sinks (SURVEY.md §2.2).

- K1 FileStreamSink   -> ``file_sink`` / streaming ``writeStream`` wrappers
- K2 JdbcSink upsert  -> ``UpsertParquetSink`` (foreachBatch MERGE analog)
- K3 Kafka producer   -> ``kafka_sink_options`` (tuned passthrough config)
"""

from .file import file_sink, streaming_file_sink
from .kafka import kafka_sink_options
from .upsert import UpsertParquetSink

__all__ = ["file_sink", "streaming_file_sink", "kafka_sink_options", "UpsertParquetSink"]

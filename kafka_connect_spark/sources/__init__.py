"""Sources (SURVEY.md §2.1)."""

from .incremental import IncrementalTableSource
from .incremental_stream import IncrementalTableDataSource
from .kafka import (
    KAFKA_RECORD_SCHEMA,
    kafka_source_options,
    mirror,
    read_cdc_stream,
    read_kafka_stream,
)
from .replay import file_replay_stream, write_replay_files
from .tailing import TailingFileDataSource

__all__ = [
    "IncrementalTableSource",
    "IncrementalTableDataSource",
    "TailingFileDataSource",
    "file_replay_stream",
    "write_replay_files",
    "KAFKA_RECORD_SCHEMA",
    "kafka_source_options",
    "read_kafka_stream",
    "read_cdc_stream",
    "mirror",
]

"""Sources (SURVEY.md §2.1)."""

from .incremental import IncrementalTableSource
from .replay import file_replay_stream, write_replay_files

__all__ = ["IncrementalTableSource", "file_replay_stream", "write_replay_files"]
